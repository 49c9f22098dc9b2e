"""Host-side lattice-size computation for packed-joint training.

The packed loss path (ops/transducer_loss.py:_packed_joint_scores) runs the
O(N·K) joint over only the valid lattice positions, but needs a STATIC
per-compile row cap. This module computes the exact number of valid
positions on the host from the raw batch metadata (audio sample lengths +
token lengths), replicating the length arithmetic of the device pipeline:

  audio samples
    -> log-mel frames      (ops/logmel.py: initial/final padding,
                            (len - win)//hop + 1)
    -> spliced frames      (ops/features.py:stack_subsample_frames,
                            ceil(frames / subsampling))
    -> encoder frames      (ops/features.py:stack_time,
                            ceil(frames / stack_time_factor))
  lattice positions = sum_i enc_frames_i * (tokens_i + 1)

Caps are quantised so only a bounded set of distinct compiles exists
(reference analogue: apex packed TransducerJoint's batch_offset metadata,
rnnt/loss.py:155-173 — computed there per batch on device; here the static
cap keeps XLA shapes fixed).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from caiman_asr_tpu.models.config import PipelineConfig
from caiman_asr_tpu.models.rnnt import RNNTModelConfig

PACK_QUANTUM = 16384


def enc_frame_lens(
    audio_lens: np.ndarray, pipe: PipelineConfig, model_cfg: RNNTModelConfig
) -> np.ndarray:
    """Encoder output lengths [B] from raw audio sample lengths [B]."""
    cfg = pipe.logmel
    lens = np.asarray(audio_lens, np.int64)
    if cfg.initial_padding:
        lens = lens + cfg.n_initial_zeros
    lens = lens + int(cfg.final_padding_secs * cfg.sample_rate)
    frames = np.maximum(0, (lens - cfg.win_length) // cfg.hop_length + 1)
    sub = pipe.splicing.frame_subsampling
    if sub > 1:
        frames = -(-frames // sub)
    return -(-frames // model_cfg.enc_stack_time_factor)


def lattice_nvalid(
    audio_lens: np.ndarray,
    token_lens: np.ndarray,
    pipe: PipelineConfig,
    model_cfg: RNNTModelConfig,
) -> int:
    """Exact number of valid (t, u) lattice positions for one microbatch."""
    enc = enc_frame_lens(audio_lens, pipe, model_cfg)
    return int(np.sum(enc * (np.asarray(token_lens, np.int64) + 1)))


def pack_cap(
    nvalid: int,
    dense_n: int,
    quantum: Optional[int] = None,
    threshold: float = 0.9,
) -> Optional[int]:
    """Quantised static cap, or None when packing wouldn't pay.

    Returns None when the quantised cap is >= threshold * dense size (the
    gather/scatter overhead then outweighs the saved joint rows — measured
    crossover ~0.9 on v5e).

    Every distinct cap is a full train-step recompile (pack_to is a static
    jit arg), so the DEFAULT quantum scales with the dense size: at least
    dense_n/8, bounding the distinct caps per bucket shape to <= ~7 (caps
    above 0.9*dense_n return None) while giving up at most 12.5% of the
    packing win to rounding. An explicit quantum is honored as given."""
    if quantum is None:
        quantum = max(PACK_QUANTUM, -(-dense_n // 8))
    cap = min(dense_n, -(-nvalid // quantum) * quantum)
    if cap >= threshold * dense_n:
        return None
    return cap
