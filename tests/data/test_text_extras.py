"""Number verbalization + WER breakdown + punctuation error rate tests."""

import pytest

from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript
from caiman_asr_tpu.data.text.numbers import (
    number_to_words,
    ordinal_to_words,
    verbalize_numbers,
)
from caiman_asr_tpu.evaluate.punctuation_error_rate import punctuation_error_rate
from caiman_asr_tpu.evaluate.wer_breakdown import wer_breakdown

CHARSET = list(" abcdefghijklmnopqrstuvwxyz'")


@pytest.mark.parametrize(
    "n,words",
    [
        (0, "zero"), (7, "seven"), (15, "fifteen"), (42, "forty two"),
        (100, "one hundred"), (317, "three hundred seventeen"),
        (1000, "one thousand"),
        (1234, "one thousand two hundred thirty four"),
        (2000000, "two million"),
        (1000000007, "one billion seven"),
    ],
)
def test_number_to_words(n, words):
    assert number_to_words(n) == words


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty first"
    assert ordinal_to_words(104) == "one hundred fourth"


def test_verbalize_forms():
    assert verbalize_numbers("it costs $5") == "it costs five dollars"
    assert verbalize_numbers("$1.50 please") == "one dollar fifty cents please"
    assert verbalize_numbers("£20 note") == "twenty pounds note"
    assert verbalize_numbers("at 3:05 pm") == "at three oh five pm"
    assert verbalize_numbers("at 3:00") == "at three o'clock"
    assert verbalize_numbers("pi is 3.14") == "pi is three point one four"
    assert verbalize_numbers("the 2nd try") == "the second try"
    assert verbalize_numbers("1,234 things") == (
        "one thousand two hundred thirty four things"
    )
    assert verbalize_numbers("$2 million deal") == "two million dollars deal"


def test_normalize_verbalizes_digits():
    out = normalize_transcript("I have 2 cats", CHARSET, NormalizeConfig())
    assert out == "i have two cats"
    out = normalize_transcript(
        "room 101", CHARSET, NormalizeConfig(verbalize_numbers=False)
    )
    assert out == "room"  # digits dropped by charset filter when disabled


def test_wer_breakdown():
    refs = ["Hello, world."]
    hyps = ["hello world"]
    res = wer_breakdown(hyps, refs, breakdown_chars=".,")
    assert res["unstandardized"] == 1.0  # both words differ (case+punct)
    assert res[f"ignore_all_{'.,'!r}"] == 0.5  # only case remains on Hello
    assert res["ignore_case"] == 1.0  # punct still attached


def test_punctuation_error_rate():
    refs = ["hello , world . how are you ?"]
    hyps = ["hello world . how are you ?"]  # comma deleted
    counts = punctuation_error_rate(refs, hyps, punctuation=".,?")
    assert counts[","].deletions == 1
    assert counts["."].correct == 1
    assert counts["?"].correct == 1
    assert counts["overall"].rate == pytest.approx(1 / 3)


def test_punctuation_insertion():
    refs = ["hello world"]
    hyps = ["hello , world"]
    counts = punctuation_error_rate(refs, hyps, punctuation=",")
    assert counts[","].insertions == 1
    assert counts[","].rate == 1.0
