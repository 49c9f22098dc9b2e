"""Pruned-loss TP step == pruned-loss DP step on a 4-device CPU mesh.

Mirrors tests/parallel/test_tp_step.py for --pruned_loss_range: the simple
heads and joint_fc shard over the vocab axis; the normaliser psum, the
banded vocab-parallel joint and the shard-local head gradients must
reproduce the single-mesh pruned objective (same global batch, dropout
off). Pruning bounds are integer and computed from replicated scores, so
TP and DP see the IDENTICAL band — the losses match to float tolerance,
not just statistically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
from caiman_asr_tpu.training.step import (
    BATCH_DIMS,
    init_train_state,
    joint_fc_pspecs,
    make_train_step,
    make_train_step_tp,
)


def _model():
    return RNNT(
        RNNTModelConfig(
            in_feats=16,
            enc_n_hid=32,
            enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1,
            enc_stack_time_factor=2,
            pred_n_hid=16,
            pred_rnn_layers=1,
            joint_n_hid=32,
            joint_dropout=0.0,
            enc_dropout=0.0,
            pred_dropout=0.0,
        ),
        n_classes=64,
    )


@pytest.mark.slow
def test_tp_pruned_step_matches_dp():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    model = _model()
    opt = build_optimizer(OptimizerConfig(), model.param_lr_factors())
    state = init_train_state(
        model, opt, jax.random.PRNGKey(0), pruned_loss=True
    )

    A, B, T, U = 2, 4, 16, 6
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 16)), jnp.float32),
        "feat_lens": jnp.full((A, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, 62, (A, B, U)), jnp.int32),
        "txt_lens": jnp.full((A, B), U, jnp.int32),
    }
    scalars = {
        "delay_penalty": jnp.zeros(()),
        "star_penalty": jnp.zeros(()),
        "grad_noise_std": jnp.zeros(()),
    }

    dp_step = make_train_step(
        model, opt, blank_idx=63, donate=False, pruned_range=3
    )
    dp_state, dp_metrics = dp_step(state, batch, jax.random.PRNGKey(1), scalars)

    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", "model"))
    pspecs = joint_fc_pspecs(state.params)
    assert "simple_am" in pspecs and pspecs["simple_am"]["w"] == P("model", None)

    def put_like_params(tree):
        return jax.device_put(
            tree, jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
        )

    tp_state = state._replace(
        params=put_like_params(state.params),
        ema_params=put_like_params(state.ema_params),
        opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    batch_sh = jax.device_put(
        batch,
        {
            k: NamedSharding(
                mesh,
                P(*([None] * BATCH_DIMS[k] + ["data"]
                    + [None] * (batch[k].ndim - BATCH_DIMS[k] - 1))),
            )
            for k in batch
        },
    )
    tp_step = make_train_step_tp(
        model, opt, mesh, blank_idx=63, donate=False, pruned_range=3
    )
    tp_state, tp_metrics = tp_step(
        tp_state, batch_sh, jax.random.PRNGKey(1), scalars
    )

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(dp_metrics["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(tp_metrics["grad_norm"]), float(dp_metrics["grad_norm"]),
        rtol=5e-3,
    )
    assert int(tp_state.step) == 1 and int(dp_state.step) == 1
    for a, b in zip(
        jax.tree.leaves(tp_state.params), jax.tree.leaves(dp_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )
