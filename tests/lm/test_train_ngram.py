"""n-gram trainer tests: normalization, perplexity sanity, ARPA round-trip."""

import math

import numpy as np
import pytest

from caiman_asr_tpu.lm.ngram import NGramLM
from caiman_asr_tpu.lm.train_ngram import (
    count_ngrams,
    train_ngram_from_sentences,
    witten_bell,
)

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog sat on the rug".split(),
    "a cat and a dog".split(),
    "the cat ran".split(),
] * 3


def test_counts():
    counts = count_ngrams([["a", "b"]], 2)
    assert counts[1][("a",)] == 1
    assert counts[2][("<s>", "a")] == 1
    assert counts[2][("b", "</s>")] == 1
    assert ("<s>",) not in {k: v for k, v in counts[1].items() if v > 0}


def test_conditional_distribution_normalizes():
    counts = count_ngrams(CORPUS, 3)
    probs, backoffs = witten_bell(counts, 3)
    lm_vocab = sorted({ng[0] for ng in probs if len(ng) == 1})

    def p(w, ctx):
        ng = ctx + (w,)
        if ng in probs:
            return probs[ng]
        return backoffs.get(ctx, 1.0) * p(w, ctx[1:]) if ctx else probs.get(
            (w,), probs[("<unk>",)]
        )

    for ctx in [("the",), ("cat",), ("the", "cat")]:
        total = sum(p(w, ctx) for w in lm_vocab)
        assert total == pytest.approx(1.0, abs=0.05), (ctx, total)


def test_arpa_roundtrip_and_ranking(tmp_path):
    arpa = train_ngram_from_sentences(CORPUS, 3, tmp_path)
    lm = NGramLM.load(arpa)
    assert lm.order == 3
    # in-domain continuation scores above out-of-domain
    s_cat, _ = lm.score("cat", ("the",))
    s_rug, _ = lm.score("rug", ("the",))
    assert s_cat > s_rug
    # sentence likelihoods: training-like sentence beats shuffled
    def sent_lp(words):
        st = lm.initial_state()
        tot = 0.0
        for w in words:
            s, st = lm.score(w, st)
            tot += s
        return tot
    good = sent_lp("the cat sat on the mat".split())
    bad = sent_lp("mat the on sat cat the".split())
    assert good > bad
    # binary cache agrees
    lm2 = NGramLM.load(tmp_path / "ngram.binary")
    s1, _ = lm.score("cat", ("the",))
    s2, _ = lm2.score("cat", ("the",))
    assert s1 == pytest.approx(s2, abs=1e-5)
