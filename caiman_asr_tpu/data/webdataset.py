"""WebDataset (tar/zip shard) reading (reference: data/webdataset/core.py:34-370).

Reads ``{key}.flac|wav`` + ``{key}.txt`` pairs from tar OR zip shards
(the reference reads both) without torchdata: plain ``tarfile``/``zipfile``
streaming with a shuffle buffer and sharding across data-parallel ranks.
Exposes the same Batch interface as AudioDataLoader so the train/val loops
are source-agnostic. Shard container format is sniffed per file, not taken
from the suffix.
"""

from __future__ import annotations

import io
import tarfile
import wave
import zipfile
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np

from caiman_asr_tpu.data.loader import Batch, quantise
from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript

AUDIO_EXTS = (".flac", ".wav")


class LengthUnknownError(Exception):
    """Tar streams have unknown length (reference core.py:26-31)."""


def _decode_audio(name: str, data: bytes, target_sr: int) -> np.ndarray:
    from caiman_asr_tpu.data.audio import resample

    if name.endswith(".flac"):
        from caiman_asr_tpu.native import flac_decode

        samples, sr, bps, _ = flac_decode(data)
        audio = samples.astype(np.float32) / float(1 << (bps - 1))
        audio = audio.mean(axis=1) if audio.shape[1] > 1 else audio[:, 0]
    else:
        with wave.open(io.BytesIO(data), "rb") as w:
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
            audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
            if w.getnchannels() > 1:
                audio = audio.reshape(-1, w.getnchannels()).mean(axis=1)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    return audio


class WebDatasetReader:
    """Iterates (audio, transcript, key) samples from tar shards."""

    def __init__(
        self,
        tar_files: Sequence[str | Path],
        sample_rate: int = 16000,
        shuffle_buffer: int = 256,
        shard_id: int = 0,
        num_shards: int = 1,
        seed: int = 0,
        max_duration: Optional[float] = None,
        max_transcript_len: Optional[int] = None,
    ):
        self.tars = [Path(t) for t in tar_files]
        for t in self.tars:
            if not t.exists():
                raise FileNotFoundError(t)
        self.sr = sample_rate
        self.shuffle_buffer = shuffle_buffer
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.seed = seed
        self.max_duration = max_duration
        self.max_transcript_len = max_transcript_len

    def __len__(self):
        raise LengthUnknownError("webdataset tar streams have unknown length")

    @staticmethod
    def _shard_members(path: Path) -> Iterator[tuple]:
        """(member name, bytes) pairs from one tar or zip shard."""
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                for info in z.infolist():
                    if not info.is_dir():
                        yield info.filename, z.read(info)
        else:
            with tarfile.open(path) as tar:
                for member in tar:
                    if member.isfile():
                        yield member.name, tar.extractfile(member).read()

    def _samples(self, epoch: int) -> Iterator[tuple]:
        i = 0
        for tar_path in self.tars:
            pending: dict = {}
            for member_name, data in self._shard_members(tar_path):
                name = Path(member_name)
                key, ext = name.stem, name.suffix.lower()
                if ext not in AUDIO_EXTS and ext != ".txt":
                    continue
                pending.setdefault(key, {})[ext] = data
                entry = pending[key]
                audio_ext = next((e for e in AUDIO_EXTS if e in entry), None)
                if audio_ext and ".txt" in entry:
                    del pending[key]
                    if i % self.num_shards == self.shard_id:
                        text = entry[".txt"].decode("utf-8").strip()
                        if (
                            self.max_transcript_len is not None
                            and len(text) > self.max_transcript_len
                        ):
                            i += 1
                            continue
                        audio = _decode_audio(
                            audio_ext, entry[audio_ext], self.sr
                        )
                        if (
                            self.max_duration is not None
                            and len(audio) / self.sr > self.max_duration
                        ):
                            i += 1
                            continue
                        yield audio, text, key
                    i += 1

    def shuffled(self, epoch: int) -> Iterator[tuple]:
        """Reservoir-style shuffle buffer (reference core.py shuffle)."""
        rng = np.random.default_rng((self.seed, epoch))
        buf: List[tuple] = []
        for s in self._samples(epoch):
            if len(buf) < self.shuffle_buffer:
                buf.append(s)
                continue
            j = int(rng.integers(len(buf)))
            yield buf[j]
            buf[j] = s
        rng.shuffle(buf)
        yield from buf


def make_padded_batch(
    group: List[tuple],
    tokenizer,
    norm_cfg: NormalizeConfig,
    charset,
    sample_quantum: int,
    token_quantum: int,
) -> Batch:
    """(audio, text, key) samples -> a quantised-shape Batch (shared by the
    webdataset and HuggingFace loaders)."""
    audios = [g[0] for g in group]
    texts = [normalize_transcript(g[1], charset, norm_cfg) for g in group]
    tokens = [tokenizer.tokenize(t) for t in texts]
    B = len(group)
    max_s = quantise(max(len(a) for a in audios), sample_quantum, sample_quantum)
    max_u = quantise(
        max(max(len(t) for t in tokens), 1), token_quantum, token_quantum
    )
    audio = np.zeros((B, max_s), np.float32)
    audio_lens = np.zeros(B, np.int32)
    toks = np.zeros((B, max_u), np.int32)
    tok_lens = np.zeros(B, np.int32)
    for i, (a, t) in enumerate(zip(audios, tokens)):
        audio[i, : len(a)] = a[:max_s]
        audio_lens[i] = min(len(a), max_s)
        toks[i, : len(t)] = t[:max_u]
        tok_lens[i] = min(len(t), max_u)
    return Batch(
        audio=audio,
        audio_lens=audio_lens,
        tokens=toks,
        token_lens=tok_lens,
        transcripts=[g[1] for g in group],
        fnames=[g[2] for g in group],
    )


class WebDatasetLoader:
    """Batch-producing loader over tar shards (AudioDataLoader-compatible)."""

    def __init__(
        self,
        reader: WebDatasetReader,
        tokenizer,
        batch_size: int,
        normalize_config: Optional[NormalizeConfig] = None,
        sample_quantum_secs: float = 2.0,
        token_quantum: int = 32,
        charset: Optional[list] = None,
        drop_last: bool = False,
    ):
        self.drop_last = drop_last
        self.reader = reader
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.norm_cfg = normalize_config or NormalizeConfig()
        self.sr = reader.sr
        self.sample_quantum = int(sample_quantum_secs * self.sr)
        self.token_quantum = token_quantum
        self.charset = charset if charset is not None else tokenizer.charset

    def epoch(self, epoch: int, resume_step: int = 0) -> Iterator[Batch]:
        group: List[tuple] = []
        skipped = 0
        for sample in self.reader.shuffled(epoch):
            group.append(sample)
            if len(group) == self.batch_size:
                if skipped < resume_step:
                    skipped += 1
                else:
                    yield make_padded_batch(
                        group, self.tokenizer, self.norm_cfg, self.charset,
                        self.sample_quantum, self.token_quantum,
                    )
                group = []
        if group and not self.drop_last and skipped >= resume_step:  # tail batch
            yield make_padded_batch(
                group, self.tokenizer, self.norm_cfg, self.charset,
                self.sample_quantum, self.token_quantum,
            )


def read_shard_transcripts(tar_files) -> list:
    """All transcripts from tar/zip shards without decoding audio (for
    tokenizer/LM training — reference webdataset_spm.py / prep_kenlm_data
    --read_from_tar)."""
    out = []
    for path in tar_files:
        for name, data in WebDatasetReader._shard_members(Path(path)):
            if name.lower().endswith(".txt"):
                out.append(data.decode("utf-8").strip())
    return out
