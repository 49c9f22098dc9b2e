"""Keyword device automaton == host trie, by construction and by property
test; fast_beam keyword boosting steers output like the host beam's
(reference rnnt/beam.py:614-627)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.keywords.device_table import (
    build_keyword_tables,
    state_dict,
)
from caiman_asr_tpu.keywords.trie import Keywords

PIECES = ["▁he", "llo", "▁wo", "rld", "▁hel", "p", "x", "▁", "q", "<b>"]


def _rand_keywords(rng):
    alphabet = "helowrdp▁"
    n = int(rng.integers(1, 5))
    words = set()
    while len(words) < n:
        ln = int(rng.integers(2, 7))
        words.add("".join(alphabet[int(rng.integers(len(alphabet)))]
                          for _ in range(ln)))
    return Keywords([(w, float(rng.uniform(0.5, 3.0))) for w in words])


def test_tables_match_host_trie_exactly():
    """Property: for random keyword sets and random piece streams, the
    table walk (score gathers + state transitions) reproduces the host
    trie's running delta AND its full thread dict at every step."""
    rng = np.random.default_rng(0)
    for trial in range(25):
        kw = _rand_keywords(rng)
        tables = build_keyword_tables(kw, PIECES)
        host_state = Keywords.init()
        dev_state = tables.init_state
        total_host, total_dev = 0.0, 0.0
        for _ in range(int(rng.integers(3, 12))):
            tok = int(rng.integers(len(PIECES)))
            d_host, host_state = kw.steps(PIECES[tok], host_state)
            total_host += d_host
            total_dev += float(tables.score[dev_state, tok])
            dev_state = int(tables.next_state[dev_state, tok])
            # the device state must represent the host thread dict exactly
            assert state_dict(kw, dev_state) == pytest.approx(host_state)
        assert total_dev == pytest.approx(total_host, abs=1e-5)


def test_commit_and_refund_in_tables():
    """One keyword split across two pieces: matching both commits the full
    weight; abandoning after the first refunds it."""
    kw = Keywords([("▁hello", 2.0)])
    tables = build_keyword_tables(kw, PIECES)
    s0 = tables.init_state
    he = PIECES.index("▁he")
    llo = PIECES.index("llo")
    x = PIECES.index("x")
    # ▁he (+2 per char * 3 chars) then llo completes: total 2*6 = 12
    d1 = float(tables.score[s0, he])
    s1 = int(tables.next_state[s0, he])
    d2 = float(tables.score[s1, llo])
    assert d1 == pytest.approx(2.0 * 3)
    assert d1 + d2 == pytest.approx(2.0 * 6)
    # ▁he then x abandons: net zero
    dx = float(tables.score[s1, x])
    assert d1 + dx == pytest.approx(0.0)


@pytest.mark.slow
def test_fast_beam_keyword_boost_steers_output(tmp_path):
    """A heavily-boosted keyword pulls the device beam toward its token,
    exactly as the host beam's trie boost does; with weight 0 the output is
    unchanged from no-keywords."""
    from caiman_asr_tpu.decoding.fast_beam import FastBeamDecoder
    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig

    n_classes = 10
    blank = n_classes - 1
    pieces = [chr(ord("a") + i) for i in range(n_classes - 1)] + ["<b>"]
    model = RNNT(
        RNNTModelConfig(
            in_feats=6, enc_n_hid=12, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=12,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        n_classes,
    )
    params = model.init(jax.random.PRNGKey(42))
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(16, 2, 6)), jnp.float32)
    lens = jnp.full((2,), 16, jnp.int32)
    encs, enc_lens, _ = model.encode(params, feats, lens)

    def run(keywords):
        dec = FastBeamDecoder(
            model, blank, beam_width=4, max_symbols_per_step=3,
            temperature=1.0, keywords=keywords,
        )
        toks, _, lens_b, _ = dec.decode_encs(
            params, np.asarray(encs), np.asarray(enc_lens)
        )
        return [tuple(toks[b, 0, : lens_b[b, 0]]) for b in range(2)]

    base = run(None)
    base_toks = {t for seq in base for t in seq}
    assert base_toks, "base decode emitted nothing; test vacuous"
    # boost a token the acoustics did NOT choose
    boosted = next(i for i in range(n_classes - 1) if i not in base_toks)
    kw = Keywords([(pieces[boosted], 50.0)])
    steered = run(build_keyword_tables(kw, pieces))
    assert any(boosted in seq for seq in steered), (
        f"boosted token {boosted} absent: {steered}"
    )
    # zero-weight keywords must be a no-op
    kw0 = Keywords([(pieces[boosted], 0.0)])
    assert run(build_keyword_tables(kw0, pieces)) == base
