"""FPGA-numerics eval emulation: `quantize: true` (reference rnn.py:72-99 +
legacy.py:216-293 quantization points: BFP(8) weights/activations along the
contraction dim, brainfloat-16 gates/cell/hidden)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.lstm import init_lstm, lstm_step, run_lstm


def _params(key, layers=2, inp=16, hid=16):
    return init_lstm(key, inp, hid, layers, forget_gate_bias=1.0)


def test_quantized_scan_matches_step_chain():
    """The scan path (offline encode) and the per-frame step path (serving)
    must apply identical quantization points."""
    key = jax.random.PRNGKey(0)
    params = _params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (5, 3, 16), jnp.float32)

    out_scan, (h_n, c_n), _ = run_lstm(params, x, quantize=True)

    h = jnp.zeros((2, 3, 16))
    c = jnp.zeros((2, 3, 16))
    outs = []
    for t in range(5):
        y, h, c = lstm_step(params, x[t], h, c, quantize=True)
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(jnp.stack(outs)), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(h), atol=1e-6)


def test_quantized_differs_but_close():
    key = jax.random.PRNGKey(1)
    params = _params(key)
    x = jax.random.normal(jax.random.fold_in(key, 2), (8, 4, 16), jnp.float32)
    q, _, _ = run_lstm(params, x, quantize=True)
    f, _, _ = run_lstm(params, x, quantize=False)
    q, f = np.asarray(q), np.asarray(f)
    assert not np.array_equal(q, f)  # quantization actually happened
    # brainfloat-16/BFP-8 keeps ~2 decimal digits; outputs are tanh-bounded
    assert np.max(np.abs(q - f)) < 0.15
    assert np.mean(np.abs(q - f)) < 0.02


def test_quantize_ignored_during_training():
    key = jax.random.PRNGKey(2)
    params = _params(key)
    x = jax.random.normal(jax.random.fold_in(key, 3), (4, 2, 16), jnp.float32)
    q, _, _ = run_lstm(params, x, quantize=True, train=True)
    f, _, _ = run_lstm(params, x, quantize=False, train=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(f))


def test_yaml_quantize_reaches_model_config(tmp_path):
    from caiman_asr_tpu.models.config import load_config

    y = tmp_path / "q.yaml"
    y.write_text("""
tokenizer:
  labels: ["a", "b"]
input_val:
  audio_dataset: {sample_rate: 16000}
  filterbank_features: {sample_rate: 16000, n_filt: 16}
  frame_splicing: {frame_stacking: 1, frame_subsampling: 1}
input_train:
  audio_dataset: {sample_rate: 16000}
  filterbank_features: {sample_rate: 16000, n_filt: 16}
  frame_splicing: {frame_stacking: 1, frame_subsampling: 1}
rnnt:
  in_feats: 16
  enc_n_hid: 16
  enc_pre_rnn_layers: 1
  enc_post_rnn_layers: 1
  enc_stack_time_factor: 2
  pred_n_hid: 16
  pred_rnn_layers: 1
  joint_n_hid: 16
  quantize: true
  custom_lstm: true
""")
    bundle = load_config(str(y))
    assert bundle.cfg.rnnt.quantize is True


def test_quantized_greedy_decode_smoke():
    """A trained-ish model decodes through the quantized path end to end
    (encode + pred + greedy) without NaNs and with outputs near the
    unquantized decode's scores."""
    from caiman_asr_tpu.decoding.greedy import GreedyDecoder
    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

    import dataclasses

    cfg = RNNTModelConfig(
        in_feats=16, enc_n_hid=16, enc_pre_rnn_layers=1,
        enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=16,
        pred_rnn_layers=1, joint_n_hid=16,
        enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
    )
    model_f = RNNT(cfg, n_classes=8)
    model_q = RNNT(dataclasses.replace(cfg, quantize=True), n_classes=8)
    params = model_f.init(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 10, 16), jnp.float32)
    lens = jnp.array([10, 8], jnp.int32)

    f_enc, _, _ = model_f.encode(params, jnp.swapaxes(x, 0, 1), lens)
    q_enc, _, _ = model_q.encode(params, jnp.swapaxes(x, 0, 1), lens)
    assert np.isfinite(np.asarray(q_enc)).all()
    assert not np.array_equal(np.asarray(f_enc), np.asarray(q_enc))

    dec = GreedyDecoder(model_q, 7, max_symbols_per_step=2)
    toks, ts, lps, counts = dec.decode_encs(params, q_enc, lens // 2)
    assert np.isfinite(np.asarray(lps)).all()
