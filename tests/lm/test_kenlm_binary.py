"""kenlm binary-format reader tests (reference lm/kenlm_ngram.py:10-48
loads kenlm .binary artifacts; here a from-scratch wire-format parser)."""

import math
from pathlib import Path

import numpy as np
import pytest

from caiman_asr_tpu.lm.kenlm_binary import (
    KenLMBinaryLM,
    combine_hash,
    murmur64a,
    parse_kenlm_binary,
    write_kenlm_binary,
)
from caiman_asr_tpu.lm.ngram import LN10, NGramLM

REFERENCE_BINARY = Path(
    "/root/reference/training/tests/test_data/ngram/ngram.binary"
)

ARPA2 = """\
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

ARPA3 = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.30103
-0.7\ta\t-0.2
-0.9\tb\t-0.1
-1.2\tc\t-0.05

\\2-grams:
-0.3\t<s> a\t-0.15
-0.4\ta b\t-0.25
-0.6\tb c\t-0.12
-0.8\tc a

\\3-grams:
-0.2\t<s> a b
-0.5\ta b c

\\end\\
"""


def test_murmur64a_known_values():
    # pinned against the vocab hash keys of a real kenlm artifact
    assert murmur64a(b"<s>") == 0x758639BD217E70
    assert murmur64a(b"</s>") == 0x6BE0737DF1F76C0A


@pytest.mark.parametrize("arpa,order", [(ARPA2, 2), (ARPA3, 3)])
def test_roundtrip_scores_match_arpa(tmp_path, arpa, order):
    """ARPA -> kenlm wire format -> parse: every conditional score equals
    the dict scorer's, including backoff chains and OOV."""
    p = tmp_path / "lm.arpa"
    p.write_text(arpa)
    ref = NGramLM.load(p)
    bp = tmp_path / "lm.kenlm"
    write_kenlm_binary(ref, bp)
    lm = parse_kenlm_binary(bp)
    assert isinstance(lm, KenLMBinaryLM)
    assert lm.order == order

    words = ["a", "b", "c", "zzz", "</s>"]
    for w0 in words:
        for ctx in [(), ("<s>",), ("a",), ("a", "b"), ("b", "c"),
                    ("zzz", "a"), ("<s>", "a")]:
            s1, st1 = ref.score(w0, ctx)
            s2, st2 = lm.score(w0, ctx)
            assert s1 == pytest.approx(s2, abs=2e-5), (w0, ctx)
            assert st1 == st2


def test_roundtrip_through_ngramlm_load(tmp_path):
    """NGramLM.load sniffs the kenlm magic and returns the binary scorer."""
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA2)
    ref = NGramLM.load(p)
    write_kenlm_binary(ref, tmp_path / "ngram.binary")
    lm = NGramLM.load(tmp_path / "ngram.binary")
    assert isinstance(lm, KenLMBinaryLM)
    s, st = lm.score("a", lm.initial_state())
    assert s == pytest.approx(-0.3 * LN10, abs=2e-5)
    assert st == ("a",)


def test_to_ngram_lm_reconstructs_dicts(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA3)
    ref = NGramLM.load(p)
    write_kenlm_binary(ref, tmp_path / "lm.kenlm")
    back = parse_kenlm_binary(tmp_path / "lm.kenlm").to_ngram_lm()
    assert set(back.probs) == set(ref.probs)
    for ng, v in ref.probs.items():
        assert back.probs[ng] == pytest.approx(v, abs=2e-5)
    for ng, v in ref.backoffs.items():
        assert back.backoffs.get(ng, 0.0) == pytest.approx(v, abs=2e-5)


def test_unsupported_variants_raise_clear_errors(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA2)
    ref = NGramLM.load(p)
    bp = tmp_path / "lm.kenlm"
    write_kenlm_binary(ref, bp)
    raw = bytearray(bp.read_bytes())
    raw[96] = 7  # unknown future model type
    (tmp_path / "unknown.kenlm").write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="#7"):
        parse_kenlm_binary(tmp_path / "unknown.kenlm")
    raw[96] = 2  # TRIE but with the probing search version 0
    (tmp_path / "badver.kenlm").write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="search version"):
        parse_kenlm_binary(tmp_path / "badver.kenlm")
    raw[96] = 0
    raw[100] = 0  # no vocabulary strings
    (tmp_path / "novocab.kenlm").write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="vocabulary"):
        parse_kenlm_binary(tmp_path / "novocab.kenlm")


@pytest.mark.skipif(
    not REFERENCE_BINARY.exists(), reason="reference asset not available"
)
def test_real_kenlm_artifact_parses_and_normalizes():
    """Parse a real kenlm-built .binary and prove correctness from first
    principles: every context's conditional probability mass sums to 1."""
    lm = parse_kenlm_binary(REFERENCE_BINARY)
    assert lm.order == 2
    assert lm.counts == (242, 534)
    assert lm.words[0] == "<unk>" and lm.words[1] == "<s>"

    V = len(lm.words)
    checked = 0
    for w1 in range(0, V, 5):
        hits = {
            w2 for w2 in range(V)
            if combine_hash(w2, w1) in lm.tables[0]
        }
        if not hits:
            continue
        mass = sum(
            math.exp(lm.tables[0][combine_hash(w2, w1)][0]) for w2 in hits
        )
        bo = lm.uni_backoff[w1]
        mass += sum(
            math.exp(bo + lm.uni_prob[w2])
            for w2 in range(V) if w2 not in hits and lm.words[w2] != "<s>"
        )
        assert mass == pytest.approx(1.0, abs=1e-4), lm.words[w1]
        checked += 1
    assert checked >= 30

    # the scorer itself: chain a real tokenized sentence
    st = lm.initial_state()
    total = 0.0
    for piece in ["▁i", "▁the"]:
        s, st = lm.score(piece, st)
        total += s
    assert total < 0.0 and np.isfinite(total)


@pytest.mark.skipif(
    not REFERENCE_BINARY.exists(), reason="reference asset not available"
)
def test_real_artifact_to_ngram_lm_and_device_tables():
    """The real artifact materializes into explicit dicts (counts match the
    header exactly) and compiles into the device fusion automaton."""
    lm = parse_kenlm_binary(REFERENCE_BINARY)
    dense = lm.to_ngram_lm()
    assert sum(1 for ng in dense.probs if len(ng) == 1) == 242
    assert sum(1 for ng in dense.probs if len(ng) == 2) == 534
    # scores agree between hash-space and dict scorers
    for w, ctx in [("▁the", ("<s>",)), ("▁the", ("▁i",)),
                   ("zzz", ())]:
        s1, _ = lm.score(w, ctx)
        s2, _ = dense.score(w, ctx)
        assert s1 == pytest.approx(s2, abs=1e-5)

    from caiman_asr_tpu.lm.device_table import build_device_tables

    pieces = lm.words[3:35]  # a toy token id -> piece mapping
    tables = build_device_tables(lm, pieces)
    assert tables.score.shape[1] == len(pieces)
