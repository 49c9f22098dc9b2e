"""Data pipeline tests: manifest -> sampler -> loader -> device features."""

import json
import wave

import numpy as np
import pytest

from caiman_asr_tpu.data.loader import AudioDataLoader, FeaturePipeline
from caiman_asr_tpu.data.manifest import load_manifest
from caiman_asr_tpu.data.sampler import (
    BucketingSampler,
    RandomSampler,
    SimpleSampler,
    SortedSampler,
)
from caiman_asr_tpu.data.tokenizer import Tokenizer, save_tokenizer_json, train_tokenizer
from caiman_asr_tpu.models.config import load_config

TEXTS = [
    "the cat sat on the mat",
    "a dog barks",
    "she sells sea shells",
    "the quick brown fox",
    "over the lazy dog",
    "transcription of speech",
    "hello world",
    "testing one two three",
]


def write_wav(path, audio, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_ds")
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.3 + 0.2 * i
        n = int(16000 * dur)
        audio = (rng.normal(size=n) * 0.1).astype(np.float32)
        fname = f"utt{i}.wav"
        write_wav(root / fname, audio)
        entries.append(
            {
                "transcript": text,
                "files": [{"fname": fname, "duration": dur}],
                "original_duration": dur,
            }
        )
    manifest = root / "manifest.json"
    manifest.write_text(json.dumps(entries))
    pieces = train_tokenizer(TEXTS * 5, vocab_size=64)
    tok_path = root / "tok.json"
    save_tokenizer_json(tok_path, pieces)
    return root, manifest, tok_path


def test_manifest_filters(tiny_dataset):
    root, manifest, _ = tiny_dataset
    utts = load_manifest(manifest)
    assert len(utts) == len(TEXTS)
    utts = load_manifest(manifest, max_duration=1.0)
    assert 0 < len(utts) < len(TEXTS)
    utts = load_manifest(manifest, max_transcript_len=12)
    assert all(len(u.transcript) <= 12 for u in utts)


def test_samplers_cover_and_shard():
    durs = np.arange(1, 33).astype(float)
    for cls in (SimpleSampler, RandomSampler, BucketingSampler, SortedSampler):
        s = cls(durs, batch_size=2, world_size=2, seed=3)
        batches = s.epoch_batches(0)
        assert all(len(b) == 4 for b in batches)
        # pessimistic first batch = the 4 longest utterances
        assert set(batches[0]) == {28, 29, 30, 31}
        seen = np.concatenate(batches[1:])
        assert len(set(seen.tolist())) == len(seen)
        # sharding splits each global batch round-robin
        r0, r1 = s.shard(batches[0], 0), s.shard(batches[0], 1)
        assert len(r0) == len(r1) == 2
        assert set(np.concatenate([r0, r1]).tolist()) == set(batches[0].tolist())
    # different epochs differ for random samplers
    s = RandomSampler(durs, batch_size=2, world_size=1, seed=3,
                      pessimistic_first_batch=False)
    e0 = np.concatenate(s.epoch_batches(0))
    e1 = np.concatenate(s.epoch_batches(1))
    assert not np.array_equal(e0, e1)


def test_loader_end_to_end(tiny_dataset):
    root, manifest, tok_path = tiny_dataset
    bundle = load_config("configs/testing-1023sp.yaml")
    pipe = bundle.cfg.input_train
    utts = load_manifest(manifest)
    tok = Tokenizer(labels=list(" abcdefghijklmnopqrstuvwxyz'"), sentpiece_model=tok_path)
    sampler = BucketingSampler(
        [u.duration for u in utts], batch_size=4, world_size=1, seed=0
    )
    loader = AudioDataLoader(utts, sampler, tok, pipe, train=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b.audio.shape[0] == 4
    assert b.audio.dtype == np.float32
    assert (b.token_lens > 0).all()
    # quantised shapes
    assert b.audio.shape[1] % loader.sample_quantum == 0
    assert b.tokens.shape[1] % loader.token_quantum == 0

    fp = FeaturePipeline(pipe, train=True)
    import jax

    feats, feat_lens = fp(b.audio, b.audio_lens, jax.random.PRNGKey(0))
    T, B, F = feats.shape
    assert B == 4 and F == pipe.logmel.n_mels * pipe.splicing.frame_stacking
    assert int(np.max(np.asarray(feat_lens))) <= T
    assert np.all(np.isfinite(np.asarray(feats)))


def test_val_pipeline_deterministic(tiny_dataset):
    root, manifest, tok_path = tiny_dataset
    bundle = load_config("configs/testing-1023sp.yaml")
    pipe = bundle.cfg.input_val
    utts = load_manifest(manifest)
    tok = Tokenizer(labels=[], sentpiece_model=tok_path)
    sampler = SortedSampler([u.duration for u in utts], batch_size=2, world_size=1,
                            pessimistic_first_batch=False)
    loader = AudioDataLoader(utts, sampler, tok, pipe, train=False)
    b1 = next(loader.epoch(0))
    b2 = next(loader.epoch(0))
    np.testing.assert_array_equal(b1.audio, b2.audio)

    fp = FeaturePipeline(pipe, train=False)
    f1, _ = fp(b1.audio, b1.audio_lens)
    f2, _ = fp(b1.audio, b1.audio_lens)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


def test_weighted_manifest_sampler():
    from caiman_asr_tpu.data.sampler import WeightedBucketingSampler

    rng = np.random.default_rng(0)
    # manifest 0: 100 utts of 1s; manifest 1: 20 utts of 1s
    durs = np.ones(120)
    mids = np.array([0] * 100 + [1] * 20)

    # relative: manifest 1 sampled 5x per epoch
    s = WeightedBucketingSampler(durs, mids, batch_size=10, world_size=1,
                                 seed=1, relative_ratios=[1.0, 5.0])
    order = np.concatenate(s.epoch_batches(0))
    counts = np.bincount(mids[order], minlength=2)
    assert 90 <= counts[0] <= 100 and 85 <= counts[1] <= 105

    # absolute 50/50 epoch split
    s2 = WeightedBucketingSampler(durs, mids, batch_size=10, world_size=1,
                                  seed=1, absolute_ratios=[0.5, 0.5])
    order2 = np.concatenate(s2.epoch_batches(0))
    counts2 = np.bincount(mids[order2], minlength=2)
    assert abs(counts2[0] - counts2[1]) < 25

    # canary exponent < 1 upweights the small manifest vs natural share
    s3 = WeightedBucketingSampler(durs, mids, batch_size=10, world_size=1,
                                  seed=1, canary_exponent=0.5)
    order3 = np.concatenate(s3.epoch_batches(0))
    counts3 = np.bincount(mids[order3], minlength=2)
    assert counts3[1] / max(counts3.sum(), 1) > 20 / 120

    import pytest as _pytest
    with _pytest.raises(ValueError):
        WeightedBucketingSampler(durs, mids, batch_size=10,
                                 absolute_ratios=[1.0, 1.0],
                                 relative_ratios=[1.0, 1.0])


def test_inspect_audio_dump(tiny_dataset, tmp_path):
    """inspect_audio_dir dumps every augmented utterance as a wav
    (reference --inspect_audio, dali/pipeline.py:142-147)."""
    import wave

    root, manifest, tok_path = tiny_dataset
    bundle = load_config("configs/testing-1023sp.yaml")
    utts = load_manifest(manifest)
    tok = Tokenizer(labels=list(" abcdefghijklmnopqrstuvwxyz'"),
                    sentpiece_model=tok_path)
    sampler = BucketingSampler(
        [u.duration for u in utts], batch_size=4, world_size=1, seed=0
    )
    dump = tmp_path / "aug"
    loader = AudioDataLoader(
        utts, sampler, tok, bundle.cfg.input_train, train=True, seed=0,
        inspect_audio_dir=str(dump),
    )
    next(iter(loader.epoch(0)))
    wavs = sorted(dump.glob("augmented_*.wav"))
    assert len(wavs) == 4
    with wave.open(str(wavs[0]), "rb") as w:
        assert w.getframerate() == bundle.cfg.input_train.logmel.sample_rate
        assert w.getnframes() > 0
