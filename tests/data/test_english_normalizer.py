"""Whisper-style English normalizer tests."""

import pytest

from caiman_asr_tpu.data.text.english_normalizer import english_normalizer
from caiman_asr_tpu.data.text.normalize import standardize_text


@pytest.mark.parametrize(
    "inp,out",
    [
        ("Mr. Smith can't go", "mister smith can not go"),
        ("um, I wanna go [laughs]", "i want to go"),
        ("they're gonna win!", "they are going to win"),
        ("the dog's bone", "the dogs bone"),
        ("Dr. Brown & Mrs. White", "doctor brown missus white"),
        ("café naïve", "cafe naive"),
        ("I have 2 cats.", "i have two cats"),
        ("it won't rain, huh?", "it will not rain"),
    ],
)
def test_normalizer_cases(inp, out):
    assert english_normalizer(inp) == out


def test_idempotent():
    s = "mister smith will not go"
    assert english_normalizer(s) == s


def test_standardize_text_uses_english_normalizer():
    assert standardize_text("<tag> Mr. X can't") == "mister x can not"


def test_wer_standardize_consistency():
    """Both sides standardized identically -> equal texts give 0 WER."""
    from caiman_asr_tpu.evaluate.wer import word_error_rate

    res = word_error_rate(
        ["they're gonna win"], ["They are going to win!"], standardize=True
    )
    assert res.wer == 0.0


def test_spelling_table_applies_when_provided(tmp_path):
    """UK->US standardization via a user-supplied Whisper-style JSON table
    (reference whisper_text_normalizer.py:144-160); the default (no path)
    uses the vendored in-tree table."""
    import json

    from caiman_asr_tpu.data.text.english_normalizer import (
        EnglishTextNormalizer,
    )

    table = tmp_path / "english.json"
    table.write_text(json.dumps({"colour": "colour2"}))
    norm = EnglishTextNormalizer(spelling_mapping_path=str(table))
    assert norm("the colour I realise") == "the colour2 i realise"
    plain = EnglishTextNormalizer()
    assert plain("the colour I realise") == "the color i realize"


def test_spelling_table_shipped_and_applied():
    """The vendored Whisper english.json (MIT; the reference ships the
    same table at data/text/english.json, applied at
    whisper_text_normalizer.py:148-160) is loaded by default and maps
    British spellings to American ones."""
    import json
    import os

    from caiman_asr_tpu.data.text import english_normalizer as mod

    path = os.path.join(os.path.dirname(mod.__file__), "english.json")
    assert os.path.exists(path), "spelling table must ship in-tree"
    table = json.load(open(path, encoding="utf-8"))
    assert len(table) > 1500 and table["colour"] == "color"
    assert (
        english_normalizer(
            "the colour of the aluminium aeroplane was analysed there"
        )
        == "the color of the aluminum airplane was analyzed there"
    )
    # every table entry round-trips through the full normalizer: the
    # mapped (American) spelling must be a fixed point
    amer = set(table.values())
    assert not (amer & set(table.keys()))
