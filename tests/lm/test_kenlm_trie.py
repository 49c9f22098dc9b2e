"""kenlm TRIE / QUANT_TRIE binary reader tests.

No real kenlm trie artifact exists on this rig (zero egress), so the
validation is: write->parse round trips of the reconstructed layout, and
content equivalence with the SAME model through the artifact-validated
ARPA and PROBING paths (see lm/kenlm_trie.py docstring for the honest
validation-tier statement)."""

import math

import pytest

from caiman_asr_tpu.lm.kenlm_binary import parse_kenlm_binary, write_kenlm_binary
from caiman_asr_tpu.lm.kenlm_trie import parse_kenlm_trie, write_kenlm_trie
from caiman_asr_tpu.lm.ngram import NGramLM

ARPA3 = """\
\\data\\
ngram 1=6
ngram 2=5
ngram 3=3

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.30103
-0.7\ta\t-0.2
-0.9\tb\t-0.1
-1.2\tc\t-0.15
-1.4\td

\\2-grams:
-0.3\t<s> a\t-0.25
-0.4\ta b\t-0.12
-0.6\tb c\t-0.05
-0.8\tc a
-0.9\ta d

\\3-grams:
-0.2\t<s> a b
-0.35\ta b c
-0.55\tb c a

\\end\\
"""

WORDS = ["<s>", "a", "b", "c", "d", "zzz"]


def _contexts(order):
    out = [()]
    for n in range(1, order):
        out += [tuple(WORDS[(i + j) % len(WORDS)] for j in range(n))
                for i in range(len(WORDS))]
    return out


@pytest.mark.parametrize("quantized", [False, True])
def test_trie_roundtrip_matches_arpa(tmp_path, quantized):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    tp = tmp_path / "lm.trie"
    write_kenlm_trie(ref, tp, quantized=quantized)
    lm = NGramLM.load(tp)  # magic sniff -> parse_kenlm_binary -> trie
    assert isinstance(lm, NGramLM)
    assert lm.order == 3
    # every stored n-gram and backoff survives
    for ng, v in ref.probs.items():
        assert lm.probs[ng] == pytest.approx(v, abs=2e-5), ng
    assert set(lm.probs) == set(ref.probs)
    for ng, v in ref.backoffs.items():
        assert lm.backoffs.get(ng, 0.0) == pytest.approx(v, abs=2e-5), ng
    # full scoring equivalence incl. backoff chains over a context sweep
    for ctx in _contexts(3):
        for w in WORDS + ["oov"]:
            want, _ = ref.score(w, ctx)
            got, _ = lm.score(w, ctx)
            assert got == pytest.approx(want, abs=3e-5), (ctx, w)


def test_trie_matches_probing_of_same_model(tmp_path):
    """The same model through both binary writers parses to identical
    scores — ties the (unvalidated-against-kenlm) trie layout to the
    artifact-validated probing path."""
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    write_kenlm_binary(ref, tmp_path / "lm.probing")
    write_kenlm_trie(ref, tmp_path / "lm.trie")
    prob = parse_kenlm_binary(tmp_path / "lm.probing")
    trie = parse_kenlm_binary(tmp_path / "lm.trie")
    for ctx in _contexts(3):
        for w in WORDS + ["oov"]:
            a, _ = prob.score(w, ctx)
            b, _ = trie.score(w, ctx)
            assert b == pytest.approx(a, abs=3e-5), (ctx, w)


def test_trie_feeds_device_tables(tmp_path):
    """A trie binary compiles into the dense device automaton (the serving
    fusion path) exactly like the ARPA."""
    from caiman_asr_tpu.lm.device_table import build_device_tables

    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    write_kenlm_trie(ref, tmp_path / "lm.trie")
    lm = NGramLM.load(tmp_path / "lm.trie")
    pieces = WORDS + ["<b>"]
    ta = build_device_tables(ref, pieces, skip_ids=[len(pieces) - 1])
    tb = build_device_tables(lm, pieces, skip_ids=[len(pieces) - 1])
    assert ta.score.shape == tb.score.shape
    assert (abs(ta.score - tb.score) < 3e-5).all()
    assert (ta.next_state == tb.next_state).all()


@pytest.mark.parametrize("quantized", [False, True])
def test_array_trie_roundtrip(tmp_path, quantized):
    """Bhiksha ARRAY_TRIE / QUANT_ARRAY_TRIE round trips match the ARPA
    (tiny model — chop lands at 0, exercising the header/offsets plumbing
    and the model-type dispatch)."""
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    tp = tmp_path / "lm.atrie"
    write_kenlm_trie(ref, tp, quantized=quantized, bhiksha=True)
    lm = NGramLM.load(tp)
    assert set(lm.probs) == set(ref.probs)
    for ng, v in ref.probs.items():
        assert lm.probs[ng] == pytest.approx(v, abs=2e-5), ng
    for ctx in _contexts(3):
        for w in WORDS + ["oov"]:
            want, _ = ref.score(w, ctx)
            got, _ = lm.score(w, ctx)
            assert got == pytest.approx(want, abs=3e-5), (ctx, w)


def _random_model(rng, n_words=48, n_bi=1200, n_tri=700):
    """A model big enough that ChopBits actually chops (the offsets array
    pays off once a layer has more entries than 64x its child count's
    high-bit range)."""
    words = [f"w{i}" for i in range(n_words)]
    probs = {("<unk>",): -1.5}
    backoffs = {}
    for w in words:
        probs[(w,)] = float(-rng.uniform(0.5, 4.0))
        backoffs[(w,)] = float(-rng.uniform(0.01, 1.0))
    seen_bi = set()
    while len(seen_bi) < n_bi:
        g = (words[rng.integers(n_words)], words[rng.integers(n_words)])
        if g in seen_bi:
            continue
        seen_bi.add(g)
        probs[g] = float(-rng.uniform(0.1, 5.0))
        backoffs[g] = float(-rng.uniform(0.01, 1.0))
    bis = sorted(seen_bi)
    seen_tri = set()
    while len(seen_tri) < n_tri:
        # a trigram's suffix (its last two words) must be a stored bigram
        # for the reverse-trie walk, so extend stored bigrams backwards
        g = (words[rng.integers(n_words)],) + bis[rng.integers(len(bis))]
        if g in seen_tri:
            continue
        seen_tri.add(g)
        probs[g] = float(-rng.uniform(0.1, 5.0))
    import caiman_asr_tpu.lm.ngram as ngram_mod

    return NGramLM(
        {k: v * ngram_mod.LN10 for k, v in probs.items()},
        {k: v * ngram_mod.LN10 for k, v in backoffs.items()},
        3,
    )


def test_array_trie_chops_and_roundtrips(tmp_path):
    """On a layer large enough for real pointer chopping the ARRAY file is
    smaller than the plain TRIE and still parses to the identical model."""
    import numpy as np

    from caiman_asr_tpu.lm.kenlm_trie import _bhiksha_geometry, _required_bits

    rng = np.random.default_rng(7)
    ref = _random_model(rng)
    inline, _, _ = _bhiksha_geometry(1201, 700, 22)
    assert inline < _required_bits(700), "fixture too small to chop"
    write_kenlm_trie(ref, tmp_path / "lm.trie")
    write_kenlm_trie(ref, tmp_path / "lm.atrie", bhiksha=True)
    assert (
        (tmp_path / "lm.atrie").stat().st_size
        < (tmp_path / "lm.trie").stat().st_size
    )
    a = parse_kenlm_binary(tmp_path / "lm.trie")
    b = parse_kenlm_binary(tmp_path / "lm.atrie")
    assert set(a.probs) == set(b.probs) == set(ref.probs)
    for ng, v in a.probs.items():
        assert b.probs[ng] == pytest.approx(v, abs=2e-5)
    for ng, v in a.backoffs.items():
        assert b.backoffs.get(ng, 0.0) == pytest.approx(v, abs=2e-5)


def test_array_trie_bad_version_errors(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    tp = tmp_path / "lm.atrie"
    write_kenlm_trie(ref, tp, bhiksha=True)
    data = bytearray(tp.read_bytes())
    # corrupt the first middle layer's bhiksha version byte
    import caiman_asr_tpu.lm.kenlm_trie as kt
    from caiman_asr_tpu.lm.kenlm_binary import _align8

    off = _align8(88 + 20 + 8 * 3) + 8 + 8 * 5 + 16 * 8  # vocab + unigrams
    off = _align8(off)
    assert data[off] == kt.BHIKSHA_VERSION
    data[off] = 9
    tp.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="compression version 9"):
        parse_kenlm_binary(tp)


def test_quantized_bins_shared_per_order(tmp_path):
    """Quantized round trip stays exact while distinct values fit the
    bins, and the parser really reads bin indices (corrupting one table
    entry shifts scores)."""
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    tp = tmp_path / "lm.qtrie"
    write_kenlm_trie(ref, tp, quantized=True, prob_bits=4, backoff_bits=4)
    lm = NGramLM.load(tp)
    for ng, v in ref.probs.items():
        assert lm.probs[ng] == pytest.approx(v, abs=2e-5)
    with pytest.raises(ValueError, match="quantize"):
        tiny = tmp_path / "tiny.qtrie"
        write_kenlm_trie(ref, tiny, quantized=True, prob_bits=1)
