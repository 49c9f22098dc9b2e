"""Greedy decoder equivalence tests.

Mirrors the reference's MockModel-based decoder tests
(training/tests/rnnt/test_decoders.py): compare the jitted lock-step decoder
against a transparent per-utterance python reference implementing the
documented semantics (advance-on-blank, max_symbols forced advance,
termination at the final frame).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.decoding.eos import EOSBlank, EOSIgnore
from caiman_asr_tpu.decoding.fuzzy import get_topk_logits
from caiman_asr_tpu.decoding.greedy import (
    GreedyDecoder,
    init_decode_state,
    make_streaming_step,
)
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

CFG = RNNTModelConfig(
    in_feats=8, enc_n_hid=12, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
    enc_stack_time_factor=2, enc_dropout=0.0, pred_n_hid=8, pred_rnn_layers=2,
    pred_dropout=0.0, joint_n_hid=12, joint_dropout=0.0,
)
K = 11  # 10 labels + blank
BLANK = K - 1


@pytest.fixture(scope="module")
def model_and_params():
    model = RNNT(CFG, K)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def python_greedy(model, params, encs, enc_lens, max_symbols=30,
                  max_symbol_per_sample=None, temperature=1.0):
    """Transparent per-utterance reference decode."""
    out = []
    B = encs.shape[0]
    for b in range(B):
        h = jnp.zeros((CFG.pred_rnn_layers, 1, CFG.pred_n_hid))
        c = jnp.zeros_like(h)
        g, (h, c) = model.pred_step(params, None, (h, c))
        t, any_tok, nb = 0, 0, 0
        toks, ts = [], []
        max_off = max(int(enc_lens[b]) - 1, 0)
        if int(enc_lens[b]) <= 0:
            out.append(([], []))
            continue
        while True:
            f = encs[b : b + 1, t]
            lp = jax.nn.log_softmax(
                model.joint_step(params, f, g).astype(jnp.float32) / temperature
            )
            k = int(jnp.argmax(lp[0]))
            at_end = t == max_off
            if at_end and k == BLANK:
                break
            if at_end and any_tok >= max_symbols:
                break
            if max_symbol_per_sample is not None and nb >= max_symbol_per_sample:
                break
            if k != BLANK:
                toks.append(k)
                ts.append(t)
                nb += 1
            any_tok += 0 if k == BLANK else 1
            advance = (k == BLANK) or (any_tok >= max_symbols)
            if not (any_tok < max_symbols or at_end):
                any_tok = 0
            if k != BLANK:
                g, (h, c) = model.pred_step(params, jnp.array([k]), (h, c))
            if advance:
                t = min(t + 1, max_off)
        out.append((toks, ts))
    return out


def fake_encs(rng, B, T, scale=3.0):
    return jnp.asarray(rng.normal(size=(B, T, CFG.joint_n_hid)).astype(np.float32) * scale)


@pytest.mark.parametrize("max_symbols", [2, 30])
def test_greedy_matches_python_reference(model_and_params, max_symbols):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    B, T = 4, 9
    encs = fake_encs(rng, B, T)
    enc_lens = jnp.asarray([9, 7, 5, 1])

    dec = GreedyDecoder(model, BLANK, max_symbols_per_step=max_symbols)
    toks, ts, lps, counts = dec.decode_encs(params, encs, enc_lens)
    want = python_greedy(model, params, encs, enc_lens, max_symbols=max_symbols)
    for b in range(B):
        n = int(counts[b])
        assert toks[b, :n].tolist() == want[b][0], f"sample {b}"
        assert ts[b, :n].tolist() == want[b][1], f"sample {b}"


def test_greedy_max_symbol_per_sample(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    encs = fake_encs(rng, 2, 8)
    enc_lens = jnp.asarray([8, 8])
    dec = GreedyDecoder(model, BLANK, max_symbol_per_sample=2)
    toks, ts, lps, counts = dec.decode_encs(params, encs, enc_lens)
    want = python_greedy(model, params, encs, enc_lens, max_symbol_per_sample=2)
    assert np.all(counts <= 2)
    for b in range(2):
        assert toks[b, : int(counts[b])].tolist() == want[b][0]


def test_full_decode_from_features(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    T, B = 12, 2
    feats = jnp.asarray(rng.normal(size=(T, B, CFG.in_feats)).astype(np.float32))
    feat_lens = jnp.asarray([12, 8])
    dec = GreedyDecoder(model, BLANK)
    responses = dec.decode(params, feats, feat_lens)
    assert len(responses) == B
    for resp in responses:
        for t, fr in resp.items():
            assert fr.final is not None and fr.partials is None
            hyp = fr.final.alternatives[0]
            assert all(tok != BLANK for tok in hyp.y_seq)
            assert all(tt == t for tt in hyp.timesteps)


def test_streaming_step_matches_full_decode(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(3)
    B, T = 3, 7
    encs = fake_encs(rng, B, T)
    enc_lens = jnp.asarray([T] * B)
    max_sym = 3

    dec = GreedyDecoder(model, BLANK, max_symbols_per_step=max_sym)
    toks, ts, lps, counts = dec.decode_encs(params, encs, enc_lens)

    step = jax.jit(make_streaming_step(model, BLANK, max_symbols_per_step=max_sym))
    state = init_decode_state(model, params, B)
    stream_toks = [[] for _ in range(B)]
    for t in range(T):
        out, n, state = step(params, encs[:, t], state)
        out = np.asarray(out)
        for b in range(B):
            stream_toks[b].extend(int(x) for x in out[b] if x != BLANK)
    for b in range(B):
        full = toks[b, : int(counts[b])].tolist()
        # The full decoder stops at the last frame once blank is predicted;
        # the streaming decoder processes every frame the same way — on
        # full-length utterances the sequences must agree.
        assert stream_toks[b] == full


def test_eos_strategies_change_logits(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(4)
    encs = fake_encs(rng, 2, 6)
    enc_lens = jnp.asarray([6, 6])
    eos_idx = 3
    base = GreedyDecoder(model, BLANK)
    ignore = GreedyDecoder(model, BLANK, eos_strategy=EOSIgnore(eos_idx))
    toks_i, _, _, counts_i = ignore.decode_encs(params, encs, enc_lens)
    assert not np.any(toks_i[np.arange(2)[:, None], :][:, : counts_i.max()] == eos_idx)
    blank_strat = GreedyDecoder(model, BLANK, eos_strategy=EOSBlank(eos_idx))
    toks_b, _, _, counts_b = blank_strat.decode_encs(params, encs, enc_lens)
    for b in range(2):
        assert eos_idx not in toks_b[b, : int(counts_b[b])].tolist()


def test_fuzzy_topk_logits():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    out = np.asarray(get_topk_logits(x))
    xr = np.asarray(x).reshape(2, 2, 8, 32)
    mx = xr.max(axis=2)
    # argmax is preserved (the max always survives)
    np.testing.assert_array_equal(out.argmax(1), np.asarray(x).argmax(1))
    # non-maxima are replaced by the row minimum
    outr = out.reshape(2, 2, 8, 32)
    masked = outr != np.asarray(x).min(1)[:, None, None, None]
    np.testing.assert_allclose(outr.max(axis=2), mx)
