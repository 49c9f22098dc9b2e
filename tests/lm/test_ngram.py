"""ARPA n-gram scorer tests (reference: tests/lm/)."""

import math

import numpy as np
import pytest

from caiman_asr_tpu.lm.ngram import LN10, NGramLM, find_ngram_path

ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.30103
-0.7\ta\t-0.2
-0.9\tb\t-0.1
-1.2\tc

\\2-grams:
-0.3\t<s> a
-0.4\ta b
-0.6\tb c

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "ngram.arpa"
    p.write_text(ARPA)
    return NGramLM.load(p)


def test_direct_bigram(lm):
    s, st = lm.score("a", lm.initial_state())
    assert abs(s - (-0.3 * LN10)) < 1e-6
    assert st == ("a",)


def test_backoff(lm):
    # P(c | a) not in bigrams: backoff(a) + P(c)
    s, _ = lm.score("c", ("a",))
    assert abs(s - ((-0.2 + -1.2) * LN10)) < 1e-6


def test_unk(lm):
    s, st = lm.score("zzz", ())
    assert abs(s - (-1.0 * LN10)) < 1e-6
    assert st == ("zzz",)


def test_chain_scores(lm):
    st = lm.initial_state()
    total = 0.0
    for w in ["a", "b", "c"]:
        s, st = lm.score(w, st)
        total += s
    expected = (-0.3 + -0.4 + -0.6) * LN10
    assert abs(total - expected) < 1e-6


def test_binary_roundtrip(lm, tmp_path):
    lm.save_binary(tmp_path / "ngram.binary.npz")
    lm2 = NGramLM.load(tmp_path / "ngram.binary.npz")
    for word, ctx in [("a", ("<s>",)), ("c", ("a",)), ("zzz", ())]:
        s1, _ = lm.score(word, ctx)
        s2, _ = lm2.score(word, ctx)
        assert abs(s1 - s2) < 1e-5
    assert lm2.order == 2


def test_find_ngram_path(tmp_path):
    assert find_ngram_path(str(tmp_path)) is None
    (tmp_path / "ngram.arpa").write_text(ARPA)
    assert find_ngram_path(str(tmp_path)).endswith("ngram.arpa")


def test_kenlm_binary_rejected_with_clear_error(tmp_path):
    """A true kenlm-format .binary (sniffed by magic bytes, not suffix)
    raises an actionable error instead of a confusing np.load failure
    (reference reads kenlm binaries via the kenlm lib, kenlm_ngram.py:10-48)."""
    p = tmp_path / "ngram.binary"
    p.write_bytes(b"mmap lm http://kheafield.com/code" + b"\x00" * 64)
    with pytest.raises(ValueError, match="kenlm"):
        NGramLM.load(p)


def test_npz_cache_loads_regardless_of_suffix(lm, tmp_path):
    """Our npz cache under the conventional 'ngram.binary' name still loads
    (format sniffing: zip magic = npz)."""
    p = tmp_path / "ngram.binary"
    lm.save_binary(p)
    lm2 = NGramLM.load(p)
    assert lm2.order == lm.order
    assert set(lm2.probs) == set(lm.probs)
    for ng, v in lm.probs.items():
        assert lm2.probs[ng] == pytest.approx(v, abs=1e-5)  # f32 cache
