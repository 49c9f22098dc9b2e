"""Train-step tests: loss decreases, NaN batches are skipped, EMA tracks,
grad accumulation matches an unaccumulated large batch, and the step runs
sharded over an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.parallel import make_mesh, shard_batch
from caiman_asr_tpu.training import (
    OptimizerConfig,
    TrainState,
    build_optimizer,
    make_train_step,
)
from caiman_asr_tpu.training.step import BATCH_DIMS, init_train_state, make_val_loss_step

N_CLASSES = 12
BLANK = N_CLASSES - 1


def tiny_model():
    cfg = RNNTModelConfig(
        in_feats=8,
        enc_n_hid=16,
        enc_pre_rnn_layers=1,
        enc_post_rnn_layers=1,
        enc_stack_time_factor=2,
        pred_n_hid=8,
        pred_rnn_layers=1,
        joint_n_hid=16,
        enc_dropout=0.0,
        pred_dropout=0.0,
        joint_dropout=0.0,
    )
    return RNNT(cfg, N_CLASSES)


def make_batch(rng, A=2, B=8, T=12, U=4):
    return {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 8)), jnp.float32),
        "feat_lens": jnp.full((A, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, N_CLASSES - 1, (A, B, U)), jnp.int32),
        "txt_lens": jnp.full((A, B), U, jnp.int32),
    }


SCALARS = {
    "delay_penalty": jnp.zeros(()),
    "star_penalty": jnp.zeros(()),
    "grad_noise_std": jnp.zeros(()),
}


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    opt = build_optimizer(
        OptimizerConfig(lr=1e-2, warmup_steps=1, hold_steps=100, half_life_steps=100),
        model.param_lr_factors(),
    )
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, BLANK, donate=False)
    return model, opt, state, step


@pytest.mark.slow
def test_loss_decreases(setup, rng):
    model, opt, state, step = setup
    batch = make_batch(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), SCALARS)
        losses.append(float(metrics["loss"]))
        assert int(metrics["skipped"]) == 0
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


@pytest.mark.slow
def test_nan_batch_skipped(setup, rng):
    model, opt, state, step = setup
    batch = make_batch(rng)
    bad = dict(batch, feats=batch["feats"].at[0, 0, 0, 0].set(jnp.nan))
    new_state, metrics = step(state, bad, jax.random.PRNGKey(0), SCALARS)
    assert int(metrics["skipped"]) == 1
    assert int(new_state.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_tracks(setup, rng):
    model, opt, state, step = setup
    batch = make_batch(rng)
    s1, _ = step(state, batch, jax.random.PRNGKey(0), SCALARS)
    # after one step: ema = 0.999*old + 0.001*new
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(s1.params)[0]
    e1 = jax.tree.leaves(s1.ema_params)[0]
    # atol: near-zero elements (~1e-6) pick up ~1e-12 reassociation noise
    # from the fused finish-step EMA ordering; rtol alone fails on them.
    np.testing.assert_allclose(
        np.asarray(e1), 0.999 * np.asarray(p0) + 0.001 * np.asarray(p1),
        rtol=1e-5, atol=1e-8,
    )


@pytest.mark.slow
def test_grad_accum_equals_big_batch(rng):
    """A=2 accumulation over B=4 must match A=1 with B=8 exactly."""
    model = tiny_model()
    opt = build_optimizer(OptimizerConfig(lr=1e-2, clip_norm=None))
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, BLANK, donate=False)

    big = make_batch(rng, A=1, B=8)
    small = {
        "feats": big["feats"].reshape(1, 12, 2, 4, 8).transpose(0, 2, 1, 3, 4).reshape(2, 12, 4, 8),
        "feat_lens": big["feat_lens"].reshape(1, 2, 4).reshape(2, 4),
        "txt": big["txt"].reshape(2, 4, -1),
        "txt_lens": big["txt_lens"].reshape(2, 4),
    }
    # reshuffle feats properly: big feats [1, T, 8, F] -> two microbatches of 4
    small["feats"] = jnp.stack(
        [big["feats"][0, :, :4], big["feats"][0, :, 4:]], axis=0
    )
    small["txt"] = jnp.stack([big["txt"][0, :4], big["txt"][0, 4:]], axis=0)

    s_big, m_big = step(state, big, jax.random.PRNGKey(7), SCALARS)
    state2 = init_train_state(model, opt, jax.random.PRNGKey(0))
    s_small, m_small = step(state2, small, jax.random.PRNGKey(7), SCALARS)
    np.testing.assert_allclose(
        float(m_big["loss"]), float(m_small["loss"]), rtol=1e-5
    )


@pytest.mark.slow
def test_sharded_step_runs(setup, rng):
    model, opt, state, step = setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = make_batch(rng, A=2, B=8)
    sharded = shard_batch(mesh, batch, {k: BATCH_DIMS[k] for k in batch})
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(0), SCALARS)
    assert np.isfinite(float(metrics["loss"]))


def test_val_loss_step(setup, rng):
    model, opt, state, step = setup
    val = make_val_loss_step(model, BLANK)
    b = make_batch(rng, A=1)
    loss_sum, n = val(state.params, {k: v[0] for k, v in b.items()})
    assert np.isfinite(float(loss_sum))
    assert float(n) == 8.0
