"""Data source tests: webdataset tars, LibriSpeech prep, spm/eos CLIs, HF
reader iteration (reference: tests/data/)."""

import io
import json
import tarfile
import wave

import numpy as np
import pytest

from caiman_asr_tpu.data.make_datasets.io import audio_duration, flac_info
from caiman_asr_tpu.data.make_datasets.librispeech import (
    parse_trans_file,
    prepare_subset,
)
from caiman_asr_tpu.data.tokenizer import Tokenizer, save_tokenizer_json, train_tokenizer
from caiman_asr_tpu.data.webdataset import (
    LengthUnknownError,
    WebDatasetLoader,
    WebDatasetReader,
)
from tests.native.test_native import encode_flac_verbatim

TEXTS = ["hello world", "the cat sat", "a dog barks", "testing one two"]


def wav_bytes(audio, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    root = tmp_path_factory.mktemp("tok")
    save_tokenizer_json(root / "t.json", train_tokenizer(TEXTS * 4, vocab_size=40))
    return Tokenizer(list(" abcdefghijklmnopqrstuvwxyz'"), root / "t.json")


@pytest.fixture(scope="module")
def tar_shard(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    path = root / "shard-000.tar"
    with tarfile.open(path, "w") as tar:
        for i, text in enumerate(TEXTS):
            audio = (rng.normal(size=4000 + 500 * i) * 0.1).astype(np.float32)
            if i % 2 == 0:
                blob = wav_bytes(audio)
                name = f"utt{i}.wav"
            else:
                blob = encode_flac_verbatim((audio * 32767).astype(np.int16))
                name = f"utt{i}.flac"
            for fname, data in [(name, blob), (f"utt{i}.txt", text.encode())]:
                info = tarfile.TarInfo(fname)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
    return path


def test_webdataset_reader(tar_shard):
    reader = WebDatasetReader([tar_shard], shuffle_buffer=2)
    samples = list(reader.shuffled(0))
    assert len(samples) == 4
    texts = sorted(s[1] for s in samples)
    assert texts == sorted(TEXTS)
    with pytest.raises(LengthUnknownError):
        len(reader)


def test_webdataset_sharding(tar_shard):
    r0 = WebDatasetReader([tar_shard], shard_id=0, num_shards=2)
    r1 = WebDatasetReader([tar_shard], shard_id=1, num_shards=2)
    k0 = {s[2] for s in r0.shuffled(0)}
    k1 = {s[2] for s in r1.shuffled(0)}
    assert k0 | k1 == {"utt0", "utt1", "utt2", "utt3"}
    assert not (k0 & k1)


def test_webdataset_loader_batches(tar_shard, tok):
    loader = WebDatasetLoader(WebDatasetReader([tar_shard]), tok, batch_size=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b.audio.shape[0] == 2
    assert (b.token_lens > 0).all()
    assert b.audio.shape[1] % loader.sample_quantum == 0


def test_librispeech_prep(tmp_path):
    # fabricate an extracted LibriSpeech tree
    rng = np.random.default_rng(0)
    chapter = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    chapter.mkdir(parents=True)
    trans = chapter / "84-121123.trans.txt"
    lines = []
    for i in range(3):
        utt = f"84-121123-{i:04d}"
        pcm = (rng.normal(size=16000 + i * 800) * 5000).astype(np.int16)
        (chapter / f"{utt}.flac").write_bytes(encode_flac_verbatim(pcm))
        lines.append(f"{utt} HELLO WORLD NUMBER {i}")
    trans.write_text("\n".join(lines))

    parsed = parse_trans_file(trans)
    assert parsed["84-121123-0000"] == "hello world number 0"

    manifest = prepare_subset(tmp_path, "dev-clean", skip_download=True)
    entries = json.loads(manifest.read_text())
    assert len(entries) == 3
    assert entries[0]["files"][0]["fname"].endswith(".flac")
    assert entries[0]["original_duration"] == pytest.approx(1.0, abs=0.01)


def test_flac_info(tmp_path):
    pcm = (np.zeros(32000)).astype(np.int16)
    f = tmp_path / "x.flac"
    f.write_bytes(encode_flac_verbatim(pcm))
    info = flac_info(f)
    assert info["sample_rate"] == 16000
    assert info["total_samples"] == 32000
    assert info["duration"] == pytest.approx(2.0)
    assert audio_duration(f) == pytest.approx(2.0)


def test_spm_train_cli(tmp_path):
    from caiman_asr_tpu.data.spm_train import main as spm_main

    entries = [
        {"transcript": t, "files": [{"fname": "x.wav", "duration": 1.0}],
         "original_duration": 1.0}
        for t in TEXTS * 3
    ]
    (tmp_path / "m.json").write_text(json.dumps(entries))
    spm_main([
        "--manifests", "m.json", "--dataset_dir", str(tmp_path),
        "--vocab_size", "40", "--output_prefix", str(tmp_path / "spm"),
    ])
    # both formats load back
    t_json = Tokenizer(list(" abcdefghijklmnopqrstuvwxyz'"), tmp_path / "spm.json")
    t_model = Tokenizer(list(" abcdefghijklmnopqrstuvwxyz'"), tmp_path / "spm.model")
    ids = t_json.tokenize("hello world")
    assert ids == t_model.tokenize("hello world")
    assert t_json.detokenize(ids) == "hello world"


def test_eos_add_cli_append_only(tmp_path):
    from caiman_asr_tpu.data.eos_add import main as eos_main

    entries = [{"transcript": "hi there", "files": [], "original_duration": 1.0}]
    (tmp_path / "in.json").write_text(json.dumps(entries))
    eos_main(["--manifest", str(tmp_path / "in.json"),
              "--output", str(tmp_path / "out.json"), "--append_only"])
    out = json.loads((tmp_path / "out.json").read_text())
    assert out[0]["transcript"] == "hi there <EOS>"


def test_eos_add_cli_segmenting(tmp_path):
    from caiman_asr_tpu.data.eos_add import main as eos_main

    entries = [
        {"transcript": "i like cake. do you like cake?", "files": []},
        {"transcript": "cut off in the middle of a", "files": []},
        {"transcript": "   ", "files": []},
    ]
    (tmp_path / "in.json").write_text(json.dumps(entries))
    eos_main(["--data_dir", str(tmp_path), "--manifests", "in.json",
              "--output_dir", str(tmp_path), "--eos_token", "<EOS>"])
    out = json.loads((tmp_path / "in.eos.json").read_text())
    by_text = {e["transcript"]: e for e in out}
    # two complete sentences -> EOS after each
    assert "i like cake. <EOS> do you like cake? <EOS>" in by_text
    assert by_text["i like cake. <EOS> do you like cake? <EOS>"]["eos_count"] == 2
    # incomplete final sentence -> no EOS at end of string
    assert by_text["cut off in the middle of a"]["eos_count"] == 0
    # whitespace-only passes through untouched
    assert "   " in by_text
    # default output name exists; rerun without --overwrite skips
    eos_main(["--data_dir", str(tmp_path), "--manifests", "in.json",
              "--output_dir", str(tmp_path)])


def test_segment_manifest_agreement_logic():
    from caiman_asr_tpu.data.segment_manifest import (
        add_eos_to_manifest,
        merge_split_words,
        rule_based_segment,
    )

    assert merge_split_words(["hello ", "wor", "ld"]) == ["hello ", "world"]
    # segmentation preserves every character
    text = "one. two! three"
    assert "".join(rule_based_segment(text)) == text
    # the repeat-agreement trick: trailing complete sentence gets an EOS,
    # trailing incomplete sentence does not
    m = add_eos_to_manifest(
        [{"transcript": "it works! but this one does not"}], "<EOS>"
    )
    assert m[0]["transcript"] == "it works! <EOS> but this one does not"
    assert m[0]["eos_count"] == 1
    m2 = add_eos_to_manifest([{"transcript": "all done here."}], "<EOS>")
    assert m2[0]["transcript"] == "all done here. <EOS>"
    assert m2[0]["eos_count"] == 1


def test_segment_manifest_avoid_empty_preserves_order():
    from caiman_asr_tpu.data.segment_manifest import (
        add_eos_to_manifest_avoid_empty,
    )

    m = [
        {"transcript": "first done."},
        {"transcript": "   "},  # whitespace-only passes through in place
        {"transcript": "third done."},
    ]
    out = add_eos_to_manifest_avoid_empty(m, "<EOS>")
    assert [u["transcript"] for u in out] == [
        "first done. <EOS>", "   ", "third done. <EOS>"
    ]


def test_mean_json_duration(tmp_path, capsys):
    from caiman_asr_tpu.data.mean_json_duration import get_parser, main

    (tmp_path / "a.json").write_text(json.dumps(
        [{"original_duration": 2.0}, {"original_duration": 4.0},
         {"original_duration": 99.0}]  # filtered by max_duration
    ))
    args = get_parser().parse_args(
        ["--jsons", "a.json", "--data_dir", str(tmp_path)]
    )
    assert main(args) == pytest.approx(3.0)
    assert "Mean duration: 3.0" in capsys.readouterr().out


def test_hf_reader_iteration(monkeypatch):
    """HF reader logic without the hub: substitute the dataset object."""
    from caiman_asr_tpu.data.hugging_face import HuggingFaceReader

    reader = HuggingFaceReader.__new__(HuggingFaceReader)
    reader.ds = [
        {"audio": {"array": np.zeros(1600), "sampling_rate": 16000},
         "text": "zero", "id": "a"},
        {"audio": {"array": np.ones(800) * 0.1, "sampling_rate": 8000},
         "text": "one", "id": "b"},
    ]
    reader.audio_column = "audio"
    reader.text_column = "text"
    reader.sr = 16000
    reader.shard_id = 0
    reader.num_shards = 1
    out = list(reader)
    assert [t for _, t, _ in out] == ["zero", "one"]
    assert len(out[1][0]) == 1600  # resampled 8k -> 16k


@pytest.fixture(scope="module")
def zip_shard(tmp_path_factory):
    """Same samples as tar_shard but in a zip container (the reference
    reads tar AND zip shards, data/webdataset/core.py)."""
    import zipfile

    root = tmp_path_factory.mktemp("wds_zip")
    rng = np.random.default_rng(0)
    path = root / "shard-000.zip"
    with zipfile.ZipFile(path, "w") as z:
        for i, text in enumerate(TEXTS):
            audio = (rng.normal(size=4000 + 500 * i) * 0.1).astype(np.float32)
            if i % 2 == 0:
                blob, name = wav_bytes(audio), f"utt{i}.wav"
            else:
                blob = encode_flac_verbatim((audio * 32767).astype(np.int16))
                name = f"utt{i}.flac"
            z.writestr(name, blob)
            z.writestr(f"utt{i}.txt", text.encode())
    return path


def test_webdataset_zip_shard(zip_shard, tar_shard):
    """Zip shards decode to the identical sample set as tar shards; mixed
    shard lists work (format sniffed per file)."""
    zs = sorted((s[1], len(s[0])) for s in WebDatasetReader([zip_shard]).shuffled(0))
    ts = sorted((s[1], len(s[0])) for s in WebDatasetReader([tar_shard]).shuffled(0))
    assert zs == ts
    mixed = WebDatasetReader([tar_shard, zip_shard])
    assert len(list(mixed.shuffled(0))) == 8


def test_narrowband_resim():
    """8 kHz round-trip removes >4 kHz content, preserves <3 kHz content and
    the array length (reference pipeline.py:407-437)."""
    from caiman_asr_tpu.data.audio import narrowband_resim

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    low = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    nb_low = narrowband_resim(low, sr)
    nb_high = narrowband_resim(high, sr)
    assert len(nb_low) == len(low) and len(nb_high) == len(high)
    mid = slice(1000, -1000)  # ignore filter edges
    assert np.corrcoef(nb_low[mid], low[mid])[0, 1] > 0.99
    assert float(np.abs(nb_high[mid]).mean()) < 0.05 * float(np.abs(high[mid]).mean())


def test_loader_narrowband_probability(tmp_path, tok):
    """prob_narrowband=1 band-limits every loaded utterance; 0 never does."""
    import wave as wave_mod

    from caiman_asr_tpu.data.loader import AudioDataLoader, Utterance
    from caiman_asr_tpu.data.sampler import SortedSampler
    from caiman_asr_tpu.models.config import PipelineConfig

    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32) / sr
    audio = (0.3 * np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
    f = tmp_path / "u0.wav"
    with wave_mod.open(str(f), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    utts = [Utterance(fname=str(f), duration=0.5, transcript="a cat")]
    pipe = PipelineConfig()

    def build(p):
        return AudioDataLoader(
            utts,
            SortedSampler([0.5], batch_size=1, world_size=1,
                          pessimistic_first_batch=False, drop_last=False),
            tok, pipe, train=False, prob_narrowband=p, num_workers=1,
        )

    b0 = next(iter(build(0.0).epoch(0)))
    b1 = next(iter(build(1.0).epoch(0)))
    e0 = float(np.abs(b0.audio[0][2000:6000]).mean())
    e1 = float(np.abs(b1.audio[0][2000:6000]).mean())
    assert e1 < 0.1 * e0  # 6 kHz tone killed by the 8 kHz round-trip


def test_prep_clis_read_shards(tar_shard, tmp_path):
    """spm_train / train_ngram / generate_mel_stats accept webdataset
    shards (--read_from_tar --tar_files; reference webdataset_spm.py,
    prep_kenlm_data.py, generate_mel_stats.py all support tar sources)."""
    from caiman_asr_tpu.data.generate_mel_stats import main as mel_main
    from caiman_asr_tpu.data.spm_train import main as spm_main
    from caiman_asr_tpu.data.webdataset import read_shard_transcripts
    from caiman_asr_tpu.lm.train_ngram import main as ngram_main

    assert sorted(read_shard_transcripts([tar_shard])) == sorted(TEXTS)

    spm_main([
        "--read_from_tar", "--tar_files", str(tar_shard),
        "--vocab_size", "40", "--output_prefix", str(tmp_path / "spm"),
    ])
    assert (tmp_path / "spm.json").exists()

    ngram_main([
        "--read_from_tar", "--tar_files", str(tar_shard),
        "--tokenizer_model", str(tmp_path / "spm.json"),
        "--order", "2", "--output_dir", str(tmp_path / "lm"),
    ])
    assert (tmp_path / "lm" / "ngram.arpa").exists()

    mel_main([
        "--model_config", "configs/testing-1023sp.yaml",
        "--read_from_tar", "--tar_files", str(tar_shard),
        "--output_path", str(tmp_path / "mel.npz"),
    ])
    z = np.load(tmp_path / "mel.npz")
    assert z["melmeans"].shape == z["melvars"].shape == (80,)


def test_make_webdataset_round_trip(tmp_path):
    """manifests -> shards (make_webdataset) -> reader yields the same
    samples."""
    import json as json_mod

    from caiman_asr_tpu.data.make_webdataset import main as make_main

    rng = np.random.default_rng(3)
    entries = []
    for i, text in enumerate(TEXTS):
        audio = (rng.normal(size=3000 + 100 * i) * 0.1).astype(np.float32)
        fn = tmp_path / f"u{i}.wav"
        fn.write_bytes(wav_bytes(audio))
        dur = (3000 + 100 * i) / 16000
        entries.append({"transcript": text,
                        "files": [{"fname": f"u{i}.wav", "duration": dur}],
                        "original_duration": dur})
    (tmp_path / "m.json").write_text(json_mod.dumps(entries))

    make_main([
        "--manifests", "m.json", "--dataset_dir", str(tmp_path),
        "--output_dir", str(tmp_path / "shards"), "--samples_per_shard", "3",
    ])
    shards = sorted((tmp_path / "shards").glob("shard-*.tar"))
    assert len(shards) == 2  # 4 samples, 3 per shard
    reader = WebDatasetReader(shards)
    samples = list(reader.shuffled(0))
    assert sorted(s[1] for s in samples) == sorted(TEXTS)
    assert all(len(s[0]) >= 3000 for s in samples)


def test_speed_perturb_rational_rate():
    """speed_perturb snaps the rate to a small rational (denominator <=
    quality_steps) before the polyphase resample: the raw-sample-count
    factors it replaced built ~rate*n-tap filters costing ~100 ms per 12 s
    utterance — 100x the whole rest of the host pipeline."""
    from fractions import Fraction

    from caiman_asr_tpu.data.audio import speed_perturb

    rng = np.random.default_rng(0)
    t = np.arange(16000, dtype=np.float32) / 16000.0
    audio = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    for rate in (0.85, 0.923, 1.1, 1.15):
        out = speed_perturb(audio, rate)
        fr = Fraction(rate).limit_denominator(64)
        # resample_poly(n, up=den, down=num) -> ceil(n * den / num) samples
        want = -(-len(audio) * fr.denominator // fr.numerator)
        assert len(out) == want, (rate, len(out), want)
        # a pure tone survives the resample: dominant bin scales by ~rate
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        f_out = np.argmax(spec) / (len(out) / 16000.0)
        assert abs(f_out - 440.0 * float(fr)) < 5.0

    # identity cases allocate nothing
    same = speed_perturb(audio, 1.0)
    assert same is audio


def test_hf_reader_real_local_dataset(tmp_path, tok, monkeypatch):
    """A REAL ``datasets.load_dataset`` call with zero egress: a local json
    dataset with inline audio arrays streams through HuggingFaceReader +
    HuggingFaceLoader all the way to padded batches (reference
    data/hugging_face/core.py:1-133 exercised against a genuine datasets
    object, not a substitute)."""
    import json as _json

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    rng = np.random.default_rng(5)
    rows = []
    for i, text in enumerate(TEXTS):
        arr = (rng.normal(size=1600 + 320 * i) * 0.1).astype(np.float64)
        # every other utterance at 8 kHz to exercise the resample path
        sr = 16000 if i % 2 == 0 else 8000
        rows.append({
            "audio": {"array": arr.tolist(), "sampling_rate": sr},
            "text": text,
            "id": f"utt{i}",
        })
    data = tmp_path / "train.jsonl"
    data.write_text("\n".join(_json.dumps(r) for r in rows))

    from caiman_asr_tpu.data.hugging_face import (
        HuggingFaceLoader,
        HuggingFaceReader,
    )

    reader = HuggingFaceReader(
        "json", split="train", streaming=True, sample_rate=16000,
    )
    # load_dataset("json", ...) needs data_files; re-load with them (the
    # reader ctor signature mirrors the reference CLI, which addresses hub
    # datasets by name — local json needs this one extra argument)
    import datasets as hf_datasets

    reader.ds = hf_datasets.load_dataset(
        "json", data_files=str(data), split="train", streaming=True
    )
    got = list(reader)
    assert [t for _, t, _ in got] == TEXTS
    # 8 kHz rows doubled in length by the resample
    assert len(got[1][0]) == 2 * (1600 + 320)

    loader = HuggingFaceLoader(reader, tok, batch_size=3)
    batches = list(loader.epoch(0))
    assert sum(b.audio.shape[0] for b in batches) == len(TEXTS)
    for b in batches:
        assert b.audio.ndim == 2 and b.tokens.ndim == 2
        assert (b.audio_lens > 0).all()
