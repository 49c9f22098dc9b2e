"""YAML config system.

Keeps the reference's config schema (training/configs/*.yaml — sections
``tokenizer``, ``input_train`` / ``input_val`` (audio_dataset,
filterbank_features, frame_splicing, spec_augment), ``rnnt``,
``grad_noise_scheduler``, ``ngram``, ``user_tokens``) so users can carry
their configs over, but validates by reflecting dataclass fields
(reference: rnnt/config.py:53-75 validates against constructor signatures).
"""

from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from caiman_asr_tpu.models.rnnt import RNNTModelConfig
from caiman_asr_tpu.ops.features import SpecAugmentConfig
from caiman_asr_tpu.ops.logmel import LogMelConfig


@dataclass(frozen=True)
class TokenizerConfig:
    sentpiece_model: Optional[str] = None
    labels: tuple = tuple(" abcdefghijklmnopqrstuvwxyz'")
    sampling: float = 0.0


@dataclass(frozen=True)
class DatasetConfig:
    sample_rate: int = 16000
    trim_silence: bool = False
    normalize_transcripts: str = "lowercase"
    standardize_wer: bool = True
    standardize_text: bool = False
    replacements: Optional[list] = None
    remove_tags: bool = True
    error_rate: str = "word"
    max_duration: Optional[float] = None
    min_duration: Optional[float] = None
    max_transcript_len: Optional[int] = None
    speed_perturbation: Optional[dict] = None


@dataclass(frozen=True)
class FrameSplicingConfig:
    frame_stacking: int = 3
    frame_subsampling: int = 3


@dataclass(frozen=True)
class GradNoiseConfig:
    noise_level: float = 0.0
    decay_const: float = 0.55
    start_step: int = 2000


@dataclass(frozen=True)
class NgramConfig:
    ngram_path: Optional[str] = None
    scale_factor: float = 0.05


@dataclass(frozen=True)
class PipelineConfig:
    """One of input_train / input_val."""

    dataset: DatasetConfig = DatasetConfig()
    logmel: LogMelConfig = LogMelConfig()
    splicing: FrameSplicingConfig = FrameSplicingConfig()
    specaugment: Optional[SpecAugmentConfig] = None


@dataclass(frozen=True)
class Config:
    rnnt: RNNTModelConfig = RNNTModelConfig()
    tokenizer: TokenizerConfig = TokenizerConfig()
    input_train: PipelineConfig = PipelineConfig()
    input_val: PipelineConfig = PipelineConfig()
    grad_noise: GradNoiseConfig = GradNoiseConfig()
    ngram: NgramConfig = NgramConfig()
    user_tokens: Dict[str, str] = field(default_factory=dict)


def _fill(cls, d: Optional[dict], where: str):
    """Construct dataclass `cls` from dict `d`, rejecting unknown keys."""
    d = dict(d or {})
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"Unknown config keys in {where}: {sorted(unknown)}")
    if "labels" in d and isinstance(d.get("labels"), list):
        d["labels"] = tuple(d["labels"])
    if "replacements" in d and d["replacements"] is not None:
        d["replacements"] = list(d["replacements"])
    return cls(**d)


_LOGMEL_KEYMAP = {
    # reference filterbank_features key -> LogMelConfig field
    "sample_rate": "sample_rate",
    "window_size": "window_size",
    "window_stride": "window_stride",
    "n_fft": "n_fft",
    "n_filt": "n_mels",
    "dither": "dither",
}
_LOGMEL_IGNORED = {"normalize", "window", "stats_path"}


def _logmel_from_yaml(d: Optional[dict]) -> tuple[LogMelConfig, Optional[str]]:
    d = dict(d or {})
    stats_path = d.get("stats_path")
    out = {}
    for k, v in d.items():
        if k in _LOGMEL_IGNORED:
            continue
        if k not in _LOGMEL_KEYMAP:
            raise ValueError(f"Unknown filterbank_features key: {k}")
        out[_LOGMEL_KEYMAP[k]] = v
    return LogMelConfig(**out), stats_path


_RNNT_IGNORED = {
    # reference-only toggles with no TPU analogue (apex packing is subsumed by
    # the fused loss; the torch/custom kernel switch has a single JAX impl).
    "joint_apex_transducer",
    "joint_apex_relu_dropout",
    "custom_lstm",
    "gpu_unavailable",
}


def _rnnt_from_yaml(d: Optional[dict]) -> RNNTModelConfig:
    d = {k: v for k, v in (d or {}).items() if k not in _RNNT_IGNORED}
    if "joint_net_lr_factor" in d:
        pass
    return _fill(RNNTModelConfig, d, "rnnt")


def _pipeline_from_yaml(d: Optional[dict], train: bool) -> tuple[PipelineConfig, Optional[str]]:
    d = dict(d or {})
    logmel, stats_path = _logmel_from_yaml(d.get("filterbank_features"))
    spec = d.get("spec_augment")
    specaugment = _fill(SpecAugmentConfig, spec, "spec_augment") if spec else None
    return (
        PipelineConfig(
            dataset=_fill(DatasetConfig, d.get("audio_dataset"), "audio_dataset"),
            logmel=logmel,
            splicing=_fill(FrameSplicingConfig, d.get("frame_splicing"), "frame_splicing"),
            specaugment=specaugment,
        ),
        stats_path,
    )


class ConfigBundle:
    """Parsed config plus side-channel paths (mel stats, sentencepiece)."""

    def __init__(self, cfg: Config, stats_path: Optional[str], raw: dict):
        self.cfg = cfg
        self.stats_path = stats_path
        self.raw = raw


def load_config(path: str | Path, max_duration: Optional[float] = None) -> ConfigBundle:
    """Load and validate a YAML config file (anchors/merges supported)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    raw = copy.deepcopy(raw)

    if max_duration is not None:
        raw.setdefault("input_train", {}).setdefault("audio_dataset", {})[
            "max_duration"
        ] = max_duration

    train_pipe, stats_train = _pipeline_from_yaml(raw.get("input_train"), True)
    val_pipe, stats_val = _pipeline_from_yaml(raw.get("input_val"), False)
    cfg = Config(
        rnnt=_rnnt_from_yaml(raw.get("rnnt")),
        tokenizer=_fill(TokenizerConfig, raw.get("tokenizer"), "tokenizer"),
        input_train=train_pipe,
        input_val=val_pipe,
        grad_noise=_fill(GradNoiseConfig, raw.get("grad_noise_scheduler"), "grad_noise_scheduler"),
        ngram=_fill(NgramConfig, raw.get("ngram"), "ngram"),
        user_tokens=dict(raw.get("user_tokens") or {}),
    )
    return ConfigBundle(cfg, stats_train or stats_val, raw)
