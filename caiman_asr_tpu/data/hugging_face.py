"""HuggingFace datasets reader (reference: data/hugging_face/core.py, 133 LoC).

Streams a HF audio dataset into the same Batch interface as the other
loaders. The ``datasets`` package is in the base image; network access is
only needed for non-cached hub datasets.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from caiman_asr_tpu.data.loader import Batch, quantise
from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript


class HuggingFaceReader:
    def __init__(
        self,
        dataset: str,
        split: str = "train",
        config: Optional[str] = None,
        audio_column: str = "audio",
        text_column: str = "text",
        sample_rate: int = 16000,
        streaming: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        import datasets as hf_datasets

        self.ds = hf_datasets.load_dataset(
            dataset, config, split=split, streaming=streaming
        )
        # Re-cast to the target sample rate ONLY when the column really is
        # an Audio feature: casting a plain {array, sampling_rate} dict
        # column (e.g. a local json dataset — the zero-egress test path)
        # would fail lazily at iteration time inside the datasets decode
        # machinery; such columns are resampled in __iter__ instead.
        feats = getattr(self.ds, "features", None)
        if feats is not None and isinstance(
            feats.get(audio_column), hf_datasets.Audio
        ):
            try:
                self.ds = self.ds.cast_column(
                    audio_column, hf_datasets.Audio(sampling_rate=sample_rate)
                )
            except Exception:
                pass
        self.audio_column = audio_column
        self.text_column = text_column
        self.sr = sample_rate
        self.shard_id = shard_id
        self.num_shards = num_shards

    def __iter__(self):
        from caiman_asr_tpu.data.audio import resample

        for i, item in enumerate(self.ds):
            if i % self.num_shards != self.shard_id:
                continue
            audio = item[self.audio_column]
            arr = np.asarray(audio["array"], np.float32)
            sr = int(audio.get("sampling_rate", self.sr))
            if sr != self.sr:
                arr = resample(arr, sr, self.sr)
            text = item[self.text_column]
            key = str(item.get("id", i))
            yield arr, text, key


class HuggingFaceLoader:
    """Batch loader over a HF reader (interface parity with the others)."""

    def __init__(
        self,
        reader: HuggingFaceReader,
        tokenizer,
        batch_size: int,
        normalize_config: Optional[NormalizeConfig] = None,
        sample_quantum_secs: float = 2.0,
        token_quantum: int = 32,
        drop_last: bool = False,
    ):
        self.drop_last = drop_last
        self.reader = reader
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.norm_cfg = normalize_config or NormalizeConfig()
        self.sr = reader.sr
        self.sample_quantum = int(sample_quantum_secs * reader.sr)
        self.token_quantum = token_quantum

    def epoch(self, epoch: int, resume_step: int = 0) -> Iterator[Batch]:
        from caiman_asr_tpu.data.webdataset import make_padded_batch

        group: List[tuple] = []
        skipped = 0
        for sample in self.reader:
            group.append(sample)
            if len(group) == self.batch_size:
                if skipped < resume_step:
                    skipped += 1
                else:
                    yield make_padded_batch(
                        group, self.tokenizer, self.norm_cfg,
                        self.tokenizer.charset, self.sample_quantum,
                        self.token_quantum,
                    )
                group = []
        if group and not self.drop_last and skipped >= resume_step:  # tail batch
            yield make_padded_batch(
                group, self.tokenizer, self.norm_cfg, self.tokenizer.charset,
                self.sample_quantum, self.token_quantum,
            )
