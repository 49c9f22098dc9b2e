"""WER / levenshtein / text standardization tests."""

import numpy as np

from caiman_asr_tpu.data.text.normalize import (
    NormalizeConfig,
    NormalizeLevel,
    normalize_transcript,
    standardize_text,
)
from caiman_asr_tpu.evaluate.wer import ErrorRateKind, levenshtein, word_error_rate


def naive_levenshtein(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
                dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return dp[-1][-1]


def test_levenshtein_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        b = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        assert levenshtein(a, b) == naive_levenshtein(a, b)


def test_wer_basic():
    res = word_error_rate(["the cat sat"], ["the cat sat"])
    assert res.wer == 0.0
    res = word_error_rate(["the bat sat"], ["the cat sat"])
    assert res.wer == 1 / 3
    res = word_error_rate(["the cat"], ["the cat sat"])
    assert res.wer == 1 / 3
    # corpus-level pooling
    res = word_error_rate(["a b", "c"], ["a b", "d"])
    assert res.wer == 1 / 3 and res.num_words == 3


def test_wer_standardized():
    res = word_error_rate(
        ["The cat, sat!"], ["the cat sat"], standardize=True
    )
    assert res.wer == 0.0
    res = word_error_rate(["i can't go"], ["i cannot go"], standardize=True)
    # hyp "can't" -> "can not" (sub + ins vs reference "cannot")
    assert res.num_words == 3 and res.scores == 2


def test_char_error_rate():
    res = word_error_rate(["abc"], ["abd"], kind=ErrorRateKind.CHAR)
    assert res.wer == 1 / 3


def test_normalize_transcript_levels():
    charset = list(" abcdefghijklmnopqrstuvwxyz'")
    raw = "Héllo <noise> World!  it's FINE"
    full = normalize_transcript(raw, charset)
    assert full == "hello world it's fine"
    lower = normalize_transcript(
        raw, charset, NormalizeConfig(level=NormalizeLevel.LOWERCASE)
    )
    assert "héllo" in lower and "<noise>" not in lower
    ident = normalize_transcript(
        raw, charset, NormalizeConfig(level=NormalizeLevel.IDENTITY)
    )
    assert ident == raw


def test_user_symbols_survive_normalization():
    charset = list(" abcdefghijklmnopqrstuvwxyz'")
    cfg = NormalizeConfig(user_symbols=("<EOS>",), remove_tags=True)
    out = normalize_transcript("Hello World <EOS>", charset, cfg)
    assert out == "hello world <EOS>"


def test_standardize_text():
    assert standardize_text("Hello, World! [laughs]") == "hello world"
    assert standardize_text("don't stop") == "do not stop"
