"""Adaptive pruning + final-emission control in the jitted device beam.

The host adaptive beam carries the reference's production pruning
(beam_prune_score_thresh / beam_prune_topk_thresh, ref beam.py:186-208,
364-366) and final-emission budget (final_emission_thresh, ref
beam.py:227-243); these tests pin the device implementations
(decoding/fast_beam.py) to the same semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.decoding.beam import RNNTBeamDecoder
from caiman_asr_tpu.decoding.fast_beam import (
    NEG_INF,
    FastBeamDecoder,
    _apply_score_thresh,
    _final_emission_prune,
    make_streaming_beam_step,
)
from caiman_asr_tpu.decoding.response import frame_responses_to_tokens
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

N_CLASSES = 10
BLANK = N_CLASSES - 1


class PieceTokenizer:
    def id_to_piece(self, i):
        return "▁" + chr(ord("a") + i)

    def detokenize(self, ids):
        return " ".join(chr(ord("a") + i) for i in ids)


@pytest.fixture(scope="module")
def model_and_params():
    model = RNNT(
        RNNTModelConfig(
            in_feats=6, enc_n_hid=12, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=12, enc_dropout=0.0,
            pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    return model, model.init(jax.random.PRNGKey(42))


# ------------------------------------------------------------------ units
def test_apply_score_thresh_unit():
    scores = jnp.asarray([[-1.0, -2.0, -9.0, NEG_INF]])
    lens = jnp.asarray([[1, 1, 1, 0]])
    out = np.asarray(_apply_score_thresh(scores, lens, 0.75))
    # norm = score/2: best -0.5; -1.0 trails by 0.5 <= 0.75 -> kept;
    # -4.5 trails by 4.0 -> killed
    assert out[0, 0] == -1.0
    assert out[0, 1] == -2.0
    assert out[0, 2] <= NEG_INF / 2 and out[0, 3] <= NEG_INF / 2


def test_final_emission_prune_unit():
    # two live hyps agreeing on 2 tokens then diverging
    toks = jnp.asarray([[[3, 4, 5, 0], [3, 4, 6, 0]]])  # [1, 2, 4]
    lens = jnp.asarray([[3, 3]])
    scores = jnp.asarray([[-1.0, -2.0]])
    z = jnp.zeros((1,), jnp.int32)

    # frame 1: prefix length 2 > committed 0 -> final advanced, no drop
    s, c, f = _final_emission_prune(scores, toks, lens, z, z, limit=2)
    assert int(c[0]) == 2 and int(f[0]) == 0
    assert np.asarray(s)[0, 1] == -2.0

    # stall: watermark stuck at 2 -> since increments; at since > limit
    # the weaker hypothesis is dropped
    c0, f0 = c, f
    for i in range(1, 3):
        s, c0, f0 = _final_emission_prune(s, toks, lens, c0, f0, limit=2)
        assert int(f0[0]) == i and np.asarray(s)[0, 1] == -2.0
    # since > limit: the weaker hypothesis is dropped this frame
    s, c0, f0 = _final_emission_prune(s, toks, lens, c0, f0, limit=2)
    assert np.asarray(s)[0, 1] <= NEG_INF / 2
    assert int(c0[0]) == 2 and int(f0[0]) == 3
    # next frame the collapsed beam commits its full length, clock resets
    s, c0, f0 = _final_emission_prune(s, toks, lens, c0, f0, limit=2)
    assert int(c0[0]) == 3 and int(f0[0]) == 0


def test_final_emission_prune_single_live():
    toks = jnp.asarray([[[3, 4, 5, 0], [0, 0, 0, 0]]])
    lens = jnp.asarray([[3, 0]])
    scores = jnp.asarray([[-1.0, NEG_INF]])
    z = jnp.zeros((1,), jnp.int32)
    s, c, f = _final_emission_prune(scores, toks, lens, z, z, limit=1)
    assert int(c[0]) == 3 and int(f[0]) == 0  # collapsed: all committed


# ------------------------------------------------------- offline decoder
def test_huge_thresholds_equal_disabled(model_and_params, rng):
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(20, 3, 6)), jnp.float32)
    lens = jnp.asarray([20, 14, 8], jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    base = FastBeamDecoder(model, BLANK, beam_width=4,
                           max_symbols_per_step=3, temperature=1.0)
    loose = FastBeamDecoder(model, BLANK, beam_width=4,
                            max_symbols_per_step=3, temperature=1.0,
                            score_thresh=1e9, topk_thresh=1e9,
                            final_emission_frames=10**6)
    a = base.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))
    b = loose.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_thresholds_never_raise_best_score(model_and_params, rng):
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(24, 4, 6)), jnp.float32)
    lens = jnp.full((4,), 24, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    free = FastBeamDecoder(model, BLANK, beam_width=4,
                           max_symbols_per_step=3, temperature=1.0)
    tight = FastBeamDecoder(model, BLANK, beam_width=4,
                            max_symbols_per_step=3, temperature=1.0,
                            score_thresh=0.4, topk_thresh=1.5)
    _, _, _, s_free = free.decode_encs(
        params, np.asarray(encs), np.asarray(enc_lens))
    _, _, _, s_tight = tight.decode_encs(
        params, np.asarray(encs), np.asarray(enc_lens))
    # pruning can only remove paths
    assert np.all(s_tight.max(axis=1) <= s_free.max(axis=1) + 1e-4)


def test_fast_beam_thresholds_match_host_beam(model_and_params, rng):
    """The device beam with the reference's production thresholds produces
    the host adaptive beam's top-1 token sequence (ref defaults 0.4/1.5;
    scripted tiny model, no fusion). This is the deployable-path parity
    the round-3 review asked for."""
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(28, 4, 6)), jnp.float32)
    lens = jnp.asarray([28, 22, 16, 10], jnp.int32)

    host = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=4, temperature=1.0,
        beam_prune_score_thresh=0.4, beam_prune_topk_thresh=1.5,
        max_symbols_per_step=3,
    )
    host_out = host.decode(params, feats, lens)
    host_toks = [frame_responses_to_tokens(r) for r in host_out]

    fast = FastBeamDecoder(
        model, BLANK, beam_width=4, max_symbols_per_step=3, temperature=1.0,
        score_thresh=0.4, topk_thresh=1.5, tokenizer=PieceTokenizer(),
    )
    fast_out = fast.decode(params, feats, lens)
    fast_toks = [frame_responses_to_tokens(r) for r in fast_out]
    assert fast_toks == host_toks


def test_final_emission_bounds_divergence(model_and_params, rng):
    """With a tight finals budget the beam is forced to agree on a prefix
    within (budget + W) frames of any divergence: the device watermark
    must keep advancing."""
    from caiman_asr_tpu.decoding.fast_beam import _lm_tables  # noqa: F401

    model, params = model_and_params
    T = 40
    feats = jnp.asarray(rng.normal(size=(T, 2, 6)), jnp.float32)
    lens = jnp.full((2,), T, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    W, fe = 4, 3
    init_state, step = make_streaming_beam_step(
        model, BLANK, beam_width=W, expansions=3, cap=64,
        final_emission_frames=fe,
    )
    state = init_state(params, 2)
    advanced_once = False
    streak = 0
    for t in range(int(enc_lens[0])):
        state = step(params, encs[:, t], state)
        scores = np.asarray(state["scores"])
        lens_s = np.asarray(state["lens"])
        comm = np.asarray(state["committed"])
        since = np.asarray(state["since_final"])
        best = scores.argmax(axis=1)
        best_len = lens_s[np.arange(2), best]
        lag = (best_len > comm).astype(np.int32)
        # the UPL guarantee: once the winning hypothesis holds lagging
        # uncommitted tokens while over budget, the blocking divergence
        # is pruned within 2 frames — the condition cannot persist
        over_lag = (since > fe) & (lag > 0)
        streak = streak + 1 if np.any(over_lag) else 0
        assert streak <= 2, (t, since, comm, best_len)
        advanced_once = advanced_once or np.any(comm > 0)
    assert advanced_once
    live = np.asarray(state["scores"]) > NEG_INF / 2
    assert live[:, 0].all()


def test_streaming_thresholds_match_offline(model_and_params, rng):
    """The streaming step chain with thresholds equals the offline jitted
    decoder with the same thresholds, frame for frame."""
    model, params = model_and_params
    T = 24
    feats = jnp.asarray(rng.normal(size=(T, 3, 6)), jnp.float32)
    lens = jnp.full((3,), T, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    dec = FastBeamDecoder(
        model, BLANK, beam_width=3, max_symbols_per_step=3, temperature=1.0,
        score_thresh=0.4, topk_thresh=1.5, final_emission_frames=4, cap=64,
    )
    toks, ts, lens_b, scores = dec.decode_encs(
        params, np.asarray(encs), np.asarray(enc_lens), cap=64
    )

    init_state, step = make_streaming_beam_step(
        model, BLANK, beam_width=3, expansions=3, cap=64, temperature=1.0,
        score_thresh=0.4, topk_thresh=1.5, final_emission_frames=4,
    )
    state = init_state(params, 3)
    for t in range(encs.shape[1]):  # enc frames: stack_time halves T
        state = step(params, encs[:, t], state)

    # compare the live beams (offline reorders lanes by normalised score)
    norm = np.asarray(state["scores"]) / np.maximum(
        np.asarray(state["lens"]) + 1, 1
    )
    order = np.argsort(-norm, axis=1)
    for b in range(3):
        got = [
            (
                np.asarray(state["toks"])[b, w, : state["lens"][b, w]].tolist(),
                float(np.asarray(state["scores"])[b, w]),
            )
            for w in order[b]
            if np.asarray(state["scores"])[b, w] > NEG_INF / 2
        ]
        want = [
            (toks[b, w, : lens_b[b, w]].tolist(), float(scores[b, w]))
            for w in range(3)
            if scores[b, w] > NEG_INF / 2
        ]
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-4
        )
