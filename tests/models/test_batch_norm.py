"""Batch-norm LSTM variant (reference rnnt/rnn.py:102-127, 168-196:
BatchNorm1d after every 1-layer LSTM; running stats torch-style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.ops.lstm import BN_MOMENTUM, batch_norm_apply


def _cfg(**kw):
    base = dict(
        in_feats=24, enc_n_hid=16, enc_pre_rnn_layers=2, enc_post_rnn_layers=2,
        enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=2, joint_n_hid=16,
        enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
    )
    base.update(kw)
    return RNNTModelConfig(**base)


def test_batch_norm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    H, T, B = 16, 7, 5
    rng = np.random.default_rng(0)
    y = rng.normal(size=(T, B, H)).astype(np.float32)
    scale = rng.normal(size=H).astype(np.float32)
    bias = rng.normal(size=H).astype(np.float32)
    mean = rng.normal(size=H).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=H).astype(np.float32)
    bn = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias),
          "mean": jnp.asarray(mean), "var": jnp.asarray(var)}

    tbn = torch.nn.BatchNorm1d(H)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
        tbn.running_mean.copy_(torch.tensor(mean))
        tbn.running_var.copy_(torch.tensor(var))
    # torch BatchNorm1d wants (N, C, L): the reference permutes (T,B,H)->(B,H,T)
    ty = torch.tensor(y).permute(1, 2, 0)

    # train mode
    updates = []
    ours = np.asarray(batch_norm_apply(bn, jnp.asarray(y), train=True,
                                       updates=updates))
    tbn.train()
    theirs = tbn(ty).permute(2, 0, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    # running stats after the torch momentum fold
    bm, bv = (np.asarray(u) for u in updates[0])
    np.testing.assert_allclose(
        (1 - BN_MOMENTUM) * mean + BN_MOMENTUM * bm,
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        (1 - BN_MOMENTUM) * var + BN_MOMENTUM * bv,
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )

    # eval mode (running-stat affine)
    bn_after = dict(bn, mean=tbn.running_mean.numpy(), var=tbn.running_var.numpy())
    ours_e = np.asarray(batch_norm_apply(bn_after, jnp.asarray(y), train=False))
    tbn.eval()
    theirs_e = tbn(ty).permute(2, 0, 1).detach().numpy()
    np.testing.assert_allclose(ours_e, theirs_e, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_updates_running_stats():
    from caiman_asr_tpu.training import make_train_step
    from caiman_asr_tpu.training.optimizer import OptimizerConfig, build_optimizer

    model = RNNT(_cfg(enc_batch_norm=True, pred_batch_norm=True), 12)
    opt = build_optimizer(OptimizerConfig(lr=1e-3))
    from caiman_asr_tpu.training.step import init_train_state

    state = init_train_state(model, opt, jax.random.PRNGKey(1))
    step = make_train_step(model, opt, blank_idx=11)
    A, B, T, U = 2, 4, 12, 5
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 24)), jnp.float32),
        "feat_lens": jnp.full((A, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, 11, size=(A, B, U)), jnp.int32),
        "txt_lens": jnp.full((A, B), U, jnp.int32),
    }
    scalars = {"delay_penalty": jnp.zeros(()), "star_penalty": jnp.zeros(()),
               "grad_noise_std": jnp.zeros(())}
    stats0 = [np.asarray(x) for pair in model.bn_stats(state.params) for x in pair]
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2), scalars)
    assert np.isfinite(float(metrics["loss"]))
    stats1 = [np.asarray(x) for pair in model.bn_stats(new_state.params) for x in pair]
    # every BN layer's running stats moved, and stayed finite
    for s0, s1 in zip(stats0, stats1):
        assert np.all(np.isfinite(s1))
        assert not np.allclose(s0, s1)


@pytest.mark.slow
def test_bn_model_decodes_greedy_and_streams():
    from caiman_asr_tpu.decoding.greedy import init_decode_state, make_streaming_step
    from caiman_asr_tpu.models.state import EncoderState

    model = RNNT(_cfg(enc_batch_norm=True, pred_batch_norm=True), 12)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 3, 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=(T, B, 24)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    f, f_lens, st = model.encode(params, x, lens)  # eval mode: running stats
    assert np.all(np.isfinite(np.asarray(f)))
    step = make_streaming_step(model, blank_idx=11, max_symbols_per_step=2)
    dec = init_decode_state(model, params, B)
    toks, n, dec = step(params, f[:, 0], dec)
    assert np.asarray(toks).shape[0] == B


def test_rsp_with_batch_norm_rejected():
    from caiman_asr_tpu.training import make_train_step
    from caiman_asr_tpu.training.optimizer import OptimizerConfig, build_optimizer

    model = RNNT(_cfg(enc_batch_norm=True), 12)
    opt = build_optimizer(OptimizerConfig(lr=1e-3))
    with pytest.raises(NotImplementedError):
        make_train_step(model, opt, blank_idx=11, rsp=True)
