"""User-token resolution + unk-handling tests + EOS end-to-end wiring."""

import numpy as np
import pytest

from caiman_asr_tpu.data.tokenizer import Tokenizer, save_tokenizer_json, train_tokenizer
from caiman_asr_tpu.data.unk_handling import (
    UnkHandling,
    check_tokenized_transcript,
    maybe_filter_transcripts,
)
from caiman_asr_tpu.utils.user_tokens import get_all_user_tokens, get_user_token, is_tag

TEXTS = ["the cat sat", "a dog barks <EOS>", "hello world <EOS>"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    root = tmp_path_factory.mktemp("ut")
    pieces = train_tokenizer(
        [t.replace(" <EOS>", "") for t in TEXTS] * 4, vocab_size=40,
        user_symbols=["<EOS>"],
    )
    save_tokenizer_json(root / "t.json", pieces)
    return Tokenizer(list(" abcdefghijklmnopqrstuvwxyz'"), root / "t.json")


def test_is_tag():
    assert is_tag("<EOS>") and is_tag("<star>")
    assert not is_tag("EOS") and not is_tag("<a b>") and not is_tag("<<x>>")


def test_get_all_user_tokens():
    assert get_all_user_tokens({"eos": "<EOS>", "star": None}) == {"eos": "<EOS>"}
    with pytest.raises(ValueError):
        get_all_user_tokens({"eos": "plain"})


def test_get_user_token_resolves_id(tok):
    idx = get_user_token("eos", {"eos": "<EOS>"}, tok)
    assert isinstance(idx, int)
    assert tok.id_to_piece(idx).lstrip("▁") == "<EOS>"
    assert get_user_token("star", {"eos": "<EOS>"}, tok) is None
    # without a tokenizer, returns the symbol
    assert get_user_token("eos", {"eos": "<EOS>"}) == "<EOS>"


def test_eos_token_survives_pipeline(tok):
    """Tokenize an EOS-suffixed transcript through normalization."""
    from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript

    cfg = NormalizeConfig(user_symbols=("<EOS>",))
    text = normalize_transcript("Hello World <EOS>", list(" abcdefghijklmnopqrstuvwxyz'"), cfg)
    assert text.endswith("<EOS>")
    ids = tok.tokenize(text)
    eos_id = get_user_token("eos", {"eos": "<EOS>"}, tok)
    assert ids[-1] == eos_id


def test_unk_handling():
    check_tokenized_transcript([1, 2], "ok", UnkHandling.FAIL)  # no unk: fine
    with pytest.raises(ValueError):
        check_tokenized_transcript([1, 0], "bad", UnkHandling.FAIL)
    with pytest.warns(UserWarning):
        check_tokenized_transcript([0], "warned-once", UnkHandling.WARN)
    assert maybe_filter_transcripts([[1], [0], [2]], UnkHandling.WARN) == [[1], [2]]
    assert maybe_filter_transcripts([[0]], UnkHandling.FAIL) == [[0]]
