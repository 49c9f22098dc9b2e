"""Jitted fast beam tests: structural invariants + scripted-parity vs the
host beam's candidate selection + score monotonicity in beam width."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.decoding.fast_beam import FastBeamDecoder
from caiman_asr_tpu.decoding.greedy import GreedyDecoder
from caiman_asr_tpu.decoding.response import frame_responses_to_tokens
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

N_CLASSES = 10
BLANK = N_CLASSES - 1


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
    return model, model.init(jax.random.PRNGKey(42))


def test_fast_beam_runs_and_is_sane(model_and_params, rng):
    model, params = model_and_params
    dec = FastBeamDecoder(model, BLANK, beam_width=4, max_symbols_per_step=3,
                          temperature=1.0)
    feats = jnp.asarray(rng.normal(size=(20, 3, 6)), jnp.float32)
    lens = jnp.asarray([20, 14, 8], jnp.int32)
    out = dec.decode(params, feats, lens)
    assert len(out) == 3
    for resp in out:
        toks = frame_responses_to_tokens(resp)
        assert all(0 <= t < BLANK for t in toks)


def test_fast_beam1_tracks_greedy_tokens(model_and_params, rng):
    """W=1, E matching greedy's per-frame cap: the single-beam search follows
    a best-path policy comparable to greedy; sequences should agree for this
    smooth random model."""
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(16, 2, 6)), jnp.float32)
    lens = jnp.full((2,), 16, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    greedy = GreedyDecoder(model, BLANK, max_symbols_per_step=3)
    g_toks, _, _, g_counts = greedy.decode_encs(params, encs, enc_lens)

    fast = FastBeamDecoder(model, BLANK, beam_width=1, max_symbols_per_step=4,
                           temperature=1.0)
    toks, ts, lens_b, scores = fast.decode_encs(
        params, np.asarray(encs), np.asarray(enc_lens)
    )
    # not an exact-equality law (beam uses cumulative scores), but both must
    # emit valid, similar-length sequences
    for b in range(2):
        assert abs(int(lens_b[b, 0]) - int(g_counts[b])) <= int(g_counts[b])


@pytest.mark.slow
def test_fast_beam_width_improves_total_score(model_and_params, rng):
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(12, 1, 6)), jnp.float32)
    lens = jnp.full((1,), 12, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    def best_score(w):
        dec = FastBeamDecoder(model, BLANK, beam_width=w, max_symbols_per_step=3,
                              temperature=1.0)
        _, _, _, scores = dec.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))
        return float(scores.max())

    s1, s8 = best_score(1), best_score(8)
    assert s8 >= s1 - 1e-4  # wider beam explores a superset of paths


def test_fast_beam_respects_lengths(model_and_params, rng):
    """Tokens must not be emitted beyond each utterance's frame count."""
    model, params = model_and_params
    dec = FastBeamDecoder(model, BLANK, beam_width=2, max_symbols_per_step=2,
                          temperature=1.0)
    feats = jnp.asarray(rng.normal(size=(20, 2, 6)), jnp.float32)
    lens = jnp.asarray([20, 4], jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)
    toks, ts, lens_b, _ = dec.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))
    # utterance 1 has only 2 encoder frames (stack_time=2): max 2*E tokens
    assert int(lens_b[1].max()) <= 2 * 2
    n = int(lens_b[1, 0])
    assert all(int(t) < 2 for t in ts[1, 0, :n])


def test_merged_scores_unit():
    """Duplicate (hash, len) rows logaddexp into the best copy; the rest
    drop to NEG_INF; non-duplicates and dead lanes untouched."""
    from caiman_asr_tpu.decoding.fast_beam import NEG_INF, _merged_scores

    s = jnp.asarray([[-1.0, -2.0, -5.0, NEG_INF]], jnp.float32)
    h = jnp.asarray([[7, 7, 3, 7]], jnp.uint32)
    l = jnp.asarray([[2, 2, 2, 2]], jnp.int32)
    out = np.asarray(_merged_scores(s, h, l))[0]
    assert out[0] == pytest.approx(np.logaddexp(-1.0, -2.0), abs=1e-5)
    assert out[1] <= NEG_INF / 2  # absorbed into lane 0
    assert out[2] == pytest.approx(-5.0, abs=1e-6)
    assert out[3] <= NEG_INF / 2  # dead lane stays dead


@pytest.mark.slow
def test_fast_beam_merge_dedups_output(model_and_params, rng):
    """With merging on, surviving hypotheses of one utterance are unique
    token sequences; and the best path's score only gains mass."""
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(18, 2, 6)), jnp.float32)
    lens = jnp.full((2,), 18, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    def run(merge):
        dec = FastBeamDecoder(model, BLANK, beam_width=4,
                              max_symbols_per_step=3, temperature=1.0,
                              merge=merge)
        return dec.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))

    toks, _, lens_b, scores = run(True)
    for b in range(toks.shape[0]):
        seqs = [
            tuple(toks[b, w, : lens_b[b, w]])
            for w in range(4)
            if scores[b, w] > -1e29
        ]
        assert len(seqs) == len(set(seqs)), f"duplicate hyps survived: {seqs}"
    _, _, _, scores_nm = run(False)
    assert float(scores.max()) >= float(scores_nm.max()) - 1e-4


def _letter_lm(tmp_path, favored="d"):
    """Unigram LM putting ~all mass on one piece."""
    from caiman_asr_tpu.lm.device_table import build_device_tables
    from caiman_asr_tpu.lm.ngram import NGramLM

    pieces = [chr(ord("a") + i) for i in range(N_CLASSES - 1)] + ["<blank>"]
    others = [p for p in pieces[:-1] if p != favored]
    lines = ["\\data\\", f"ngram 1={len(pieces)}", "", "\\1-grams:"]
    lines.append(f"-0.01\t{favored}")
    for p in others:
        lines.append(f"-6.0\t{p}")
    lines += ["-6.0\t<unk>", "", "\\end\\", ""]
    p = tmp_path / "lm.arpa"
    p.write_text("\n".join(lines))
    lm = NGramLM.load(p)
    return build_device_tables(lm, pieces, skip_ids=[BLANK])


@pytest.mark.slow
def test_fast_beam_lm_fusion_steers_output(model_and_params, rng, tmp_path):
    """A strong unigram LM on one token must pull the beam toward it
    (reference shallow-fusion semantics, rnnt/beam.py:496)."""
    model, params = model_and_params
    feats = jnp.asarray(rng.normal(size=(16, 2, 6)), jnp.float32)
    lens = jnp.full((2,), 16, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)
    tables = _letter_lm(tmp_path, favored="d")

    def run(alpha):
        dec = FastBeamDecoder(model, BLANK, beam_width=4,
                              max_symbols_per_step=3, temperature=1.0,
                              ngram_lm=tables, ngram_alpha=alpha)
        toks, _, lens_b, scores = dec.decode_encs(
            params, np.asarray(encs), np.asarray(enc_lens)
        )
        best = [tuple(toks[b, 0, : lens_b[b, 0]]) for b in range(2)]
        return best

    base = run(0.0)
    # blank is never LM-scored, so fusion cannot force emissions — it can
    # only rerank/suppress non-blank tokens. The base output's tokens are
    # all penalized by this LM, so a strong alpha must remove them.
    steered = run(8.0)
    base_toks = {t for seq in base for t in seq}
    assert base_toks, "base decode emitted nothing; test vacuous"
    d = ord("d") - ord("a")
    assert d not in base_toks
    for seq in steered:
        for t in seq:
            assert t == d, f"non-favored token {t} survived strong fusion"

    # an LM that AGREES with the acoustics keeps (or amplifies) exactly the
    # tokens the acoustics chose — never introduces penalized ones
    fav = next(iter(base_toks))
    agree = _letter_lm(tmp_path, favored=chr(ord("a") + fav))
    dec = FastBeamDecoder(model, BLANK, beam_width=4, max_symbols_per_step=3,
                          temperature=1.0, ngram_lm=agree, ngram_alpha=2.0)
    toks, _, lens_b, _ = dec.decode_encs(
        params, np.asarray(encs), np.asarray(enc_lens)
    )
    agreed = [tuple(toks[b, 0, : lens_b[b, 0]]) for b in range(2)]
    assert all(t == fav for seq in agreed for t in seq)
    assert any(len(seq) > 0 for seq in agreed)


class _BurstBeam(FastBeamDecoder):
    """Scripted joint: the model wants to emit the fixed token sequence
    BURST as an immediate burst (position-free — the acoustics barely
    matter), exactly the emission pattern of a word-level-piece overfit.
    The pred-state position is smuggled through g[..., 0]."""

    BURST = [3, 5, 2, 7, 4, 6, 1, 3]

    def _logprobs(self, params, f, g):
        B, W = g.shape[0], g.shape[1]
        pos = jnp.clip(g[..., 0].astype(jnp.int32), 0, len(self.BURST))
        want = jnp.asarray(self.BURST + [0], jnp.int32)[pos]  # [B, W]
        done = pos >= len(self.BURST)
        K = N_CLASSES
        base = jnp.full((B, W, K), -12.0)
        onehot = jax.nn.one_hot(want, K, dtype=jnp.float32)
        onehot = jnp.where(done[..., None], 0.0, onehot)  # done: nothing wanted
        lp = base + onehot * 11.9  # wanted token: -0.1
        blank = jnp.where(done, -0.01, -5.0)
        lp = lp.at[..., BLANK].set(blank)
        # normalize-ish (values are already log-prob scaled; exactness of
        # the distribution doesn't matter for the search semantics)
        return lp

    def _pred_advance(self, params, tokens, h, c):
        B, W = tokens.shape
        g_pos = h[0, :, :, 0] + 1.0  # position counter rides h[0,...,0]
        h2 = h.at[0, :, :, 0].set(g_pos)
        g = jnp.zeros((B, W, self.model.cfg.joint_n_hid), h.dtype)
        g = g.at[..., 0].set(g_pos)
        return g, h2, c


def test_fast_beam_completes_burst_emissions(model_and_params):
    """Regression (round 5): a model emitting a many-token burst in one
    frame must not be truncated by the per-frame expansion bound — the
    device loop's cap is E tokens/frame (HOST-equal semantics,
    beam.py _may_emit), and mid-burst prefixes must survive frame
    boundaries through the kept pool. Before the fix the device beam
    emitted NOTHING at W=1 (the 0-token blank hyp won every frame) and
    truncated at W=4, while the host beam was exact."""
    model, params = model_and_params
    T, Hj = 6, model.cfg.joint_n_hid
    encs = jnp.zeros((1, T, Hj))
    enc_lens = jnp.asarray([T])
    for W in (1, 2, 4):
        dec = _BurstBeam(model, BLANK, beam_width=W, max_symbols_per_step=8)
        toks, ts, lens, scores = dec.decode_encs(params, encs, enc_lens)
        got = [int(t) for t in toks[0, 0, : int(lens[0, 0])]]
        assert got == _BurstBeam.BURST, (
            f"W={W}: burst truncated/garbled: {got}"
        )
