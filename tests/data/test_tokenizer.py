"""Tokenizer tests: train -> save -> load -> roundtrip, SPM binary I/O."""

import numpy as np

from caiman_asr_tpu.data.tokenizer import (
    Tokenizer,
    UnigramModel,
    load_sentencepiece_model,
    save_sentencepiece_model,
    save_tokenizer_json,
    train_tokenizer,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells on the sea shore",
] * 10


def test_train_save_load_roundtrip(tmp_path):
    pieces = train_tokenizer(CORPUS, vocab_size=60)
    assert pieces[0][0] == "<unk>"
    assert len(pieces) <= 61

    jpath = tmp_path / "tok.json"
    save_tokenizer_json(jpath, pieces)
    tok = Tokenizer(labels=list(" abcdefghijklmnopqrstuvwxyz'"), sentpiece_model=jpath)

    for text in ["the cat sat", "a lazy dog", "sea shells"]:
        ids = tok.tokenize(text)
        assert len(ids) > 0
        assert tok.detokenize(ids) == text


def test_spm_binary_roundtrip(tmp_path):
    pieces = train_tokenizer(CORPUS, vocab_size=40)
    path = tmp_path / "tok.model"
    save_sentencepiece_model(path, pieces)
    loaded = load_sentencepiece_model(path)
    assert len(loaded) == len(pieces)
    for (p1, s1, t1), (p2, s2, t2) in zip(pieces, loaded):
        assert p1 == p2 and t1 == t2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    tok = Tokenizer(labels=[], sentpiece_model=path)
    assert tok.detokenize(tok.tokenize("the cat")) == "the cat"


def test_unknown_chars_map_to_unk():
    pieces = train_tokenizer(CORPUS, vocab_size=40)
    model = UnigramModel(pieces)
    ids = model.encode("▁20é")  # digits/accents unseen in corpus
    assert model.unk_id in ids


def test_sampling_produces_variants_and_valid_roundtrip(tmp_path):
    pieces = train_tokenizer(CORPUS, vocab_size=60)
    jpath = tmp_path / "tok.json"
    save_tokenizer_json(jpath, pieces)
    tok = Tokenizer(labels=[], sentpiece_model=jpath, sampling=1.0, seed=0)
    text = "the quick brown fox"
    outs = {tuple(tok.tokenize(text)) for _ in range(20)}
    assert len(outs) > 1  # sampling varies segmentation
    for ids in outs:
        assert tok.detokenize(list(ids)) == text  # but always decodes back


def test_user_symbols_become_pieces():
    pieces = train_tokenizer(CORPUS, vocab_size=50, user_symbols=["<EOS>"])
    names = [p for p, _, _ in pieces]
    assert "<EOS>" in names
