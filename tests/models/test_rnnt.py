"""RNN-T model tests: shapes, streaming-state consistency, config loading."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.models.config import load_config
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.ops.transducer_loss import transducer_loss_from_fg

TINY = RNNTModelConfig(
    in_feats=12,
    enc_n_hid=16,
    enc_pre_rnn_layers=2,
    enc_post_rnn_layers=2,
    enc_stack_time_factor=2,
    enc_dropout=0.0,
    pred_n_hid=8,
    pred_rnn_layers=2,
    pred_dropout=0.0,
    joint_n_hid=16,
    joint_dropout=0.0,
)
N_CLASSES = 29  # 28 labels + blank


def make_model():
    model = RNNT(TINY, N_CLASSES)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_shapes_and_param_structure():
    model, params = make_model()
    assert params["prediction"]["embed"].shape == (N_CLASSES - 1, TINY.pred_n_hid)
    assert params["joint_fc"]["w"].shape == (N_CLASSES, TINY.joint_n_hid)

    T, B = 12, 3
    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, B, TINY.in_feats)), jnp.float32)
    x_lens = jnp.asarray([12, 10, 7])
    f, f_lens, enc_state = model.encode(params, x, x_lens)
    assert f.shape == (B, T // 2, TINY.joint_n_hid)
    np.testing.assert_array_equal(np.asarray(f_lens), [6, 5, 4])
    assert enc_state.pre_rnn[0].shape == (2, B, TINY.enc_n_hid)

    y = jnp.asarray(np.random.default_rng(1).integers(0, N_CLASSES - 1, size=(B, 5)))
    g, hid, all_hid = model.predict(params, y)
    assert g.shape == (B, 6, TINY.joint_n_hid)
    assert hid[0].shape == (2, B, TINY.pred_n_hid)
    assert all_hid[0].shape == (2, 6, B, TINY.pred_n_hid)

    logits = model.joint(params, f, g)
    assert logits.shape == (B, 6, 6, N_CLASSES)


def test_streaming_encoder_state_consistency():
    """Encoding a sequence in two chunks with carried state must match
    encoding it at once (the core streaming-inference invariant)."""
    model, params = make_model()
    T, B = 16, 2
    x = jnp.asarray(np.random.default_rng(2).normal(size=(T, B, TINY.in_feats)), jnp.float32)
    x_lens = jnp.asarray([T, T])

    f_full, _, _ = model.encode(params, x, x_lens)

    half = T // 2
    f1, l1, st = model.encode(params, x[:half], jnp.asarray([half, half]))
    f2, l2, _ = model.encode(params, x[half:], jnp.asarray([half, half]), st)
    f_chunks = jnp.concatenate([f1, f2], axis=1)
    np.testing.assert_allclose(np.asarray(f_full), np.asarray(f_chunks), atol=1e-5)


def test_pred_net_state_consistency():
    """predict over y = [y1, y2] must equal predict(y1) then predict(y2)
    with the carried state + last-token SOS."""
    model, params = make_model()
    B, U = 2, 6
    y = jnp.asarray(np.random.default_rng(3).integers(0, N_CLASSES - 1, size=(B, U)))
    g_full, _, _ = model.predict(params, y)

    y1, y2 = y[:, :3], y[:, 3:]
    g1, hid1, all_hid1 = model.predict(params, y1)
    # State before the last token of y1, then re-feed last token as SOS.
    h = all_hid1[0][:, 3 - 1]  # state after consuming SOS + first 2 tokens
    c = all_hid1[1][:, 3 - 1]
    g2, _, _ = model.predict(
        params, y2, pred_state=(h, c), special_sos=y1[:, -1:]
    )
    # g_full positions: 0..U; g1 covers 0..3 (SOS + 3 tokens), g2 covers
    # positions 3..6 shifted: g2[0] corresponds to g_full[3].
    np.testing.assert_allclose(np.asarray(g_full[:, :3]), np.asarray(g1[:, :3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_full[:, 3:]), np.asarray(g2), atol=1e-5)


@pytest.mark.slow
def test_forward_loss_and_grads():
    model, params = make_model()
    T, B, U = 12, 2, 4
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(T, B, TINY.in_feats)), jnp.float32)
    x_lens = jnp.asarray([12, 9])
    y = jnp.asarray(rng.integers(0, N_CLASSES - 1, size=(B, U)))
    y_lens = jnp.asarray([4, 3])

    def loss_fn(p):
        (f, f_lens), (g, g_lens), _ = model.enc_pred(p, x, x_lens, y, y_lens)
        loss = transducer_loss_from_fg(
            f, g, p["joint_fc"]["w"], p["joint_fc"]["b"], y, f_lens, y_lens,
            N_CLASSES - 1, t_chunk=4,
        )
        return loss.mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_config_loading():
    bundle = load_config("configs/base-8703sp.yaml")
    cfg = bundle.cfg
    assert cfg.rnnt.enc_n_hid == 1024
    assert cfg.rnnt.joint_net_lr_factor == 0.343
    assert cfg.input_train.dataset.trim_silence is True
    assert cfg.input_val.dataset.trim_silence is False
    assert cfg.input_train.specaugment.freq_masks == 2
    assert cfg.input_val.logmel.n_mels == 80
    assert cfg.input_train.dataset.max_duration == 20.0
    assert cfg.user_tokens["eos"] == "<EOS>"

    big = load_config("configs/large-17407sp.yaml").cfg
    assert big.rnnt.enc_n_hid == 1536 and big.rnnt.joint_n_hid == 1024
    tiny = load_config("configs/testing-1023sp.yaml").cfg
    assert tiny.rnnt.enc_post_rnn_layers == 3


def test_param_count_base_is_85m():
    """The base config must land at the published ~85M parameters."""
    bundle = load_config("configs/base-8703sp.yaml")
    model = RNNT(bundle.cfg.rnnt, 8704)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    assert 80e6 < n < 90e6, f"param count {n/1e6:.1f}M out of range"
