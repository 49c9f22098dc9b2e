"""Post-frontend feature processing: SpecAugment and frame stacking.

TPU-native, fully vectorised equivalents of the reference's torch feat procs
(training/caiman_asr_train/data/features.py:34-164). The reference loops over
the batch on the host per sample; here masks are generated with vmapped
``jax.random`` so the whole batch runs inside one jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class SpecAugmentConfig:
    """Reference: configs/*.yaml spec_augment block; features.py:38-63.

    ``time_masks`` / ``max_time`` in (0, 1) are adaptive fractions of each
    utterance's length (arXiv:1912.05533).
    """

    freq_masks: int = 2
    min_freq: int = 0
    max_freq: int = 20
    time_masks: float = 10
    min_time: int = 0
    max_time: float = 0.03
    # Static cap used to keep shapes fixed when time_masks is adaptive.
    max_time_masks: int = 40


def _mask_axis(rng, n_masks_max, n_masks, w_min, w_max_arr, size, length):
    """Build a 1-D boolean mask of `size` with up to n_masks_max random bands.

    n_masks, w_max_arr may be traced scalars (adaptive per utterance).
    Returns bool [size] where True = masked.
    """
    r_w, r_s = jax.random.split(rng)
    # Widths uniform in [w_min, w_max] inclusive (per mask).
    u = jax.random.uniform(r_w, (n_masks_max,))
    w = (u * (w_max_arr - w_min + 1)).astype(jnp.int32) + w_min
    # Start positions uniform in [0, max(1, size - w + 1)).
    u2 = jax.random.uniform(r_s, (n_masks_max,))
    hi = jnp.maximum(1, size - w + 1)
    s = (u2 * hi).astype(jnp.int32)
    active = jnp.arange(n_masks_max) < n_masks
    ix = lax.broadcasted_iota(jnp.int32, (n_masks_max, size), 1)
    bands = (ix >= s[:, None]) & (ix < (s + w)[:, None]) & active[:, None]
    return jnp.any(bands, axis=0)


@partial(jax.jit, static_argnames=("cfg",))
def spec_augment(
    rng: jax.Array,
    feats: jax.Array,
    feat_lens: jax.Array,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jax.Array:
    """Apply SpecAugment. feats: [B, M, T]; feat_lens: [B]. Returns masked feats."""
    B, M, T = feats.shape

    def one(rng, length):
        r_f, r_t = jax.random.split(rng)
        fmask = _mask_axis(
            r_f, cfg.freq_masks, cfg.freq_masks, cfg.min_freq,
            jnp.asarray(cfg.max_freq), M, length,
        )
        tm = cfg.time_masks
        n_time = (
            jnp.round(length.astype(jnp.float32) * tm).astype(jnp.int32)
            if 0 < tm < 1.0
            else jnp.asarray(int(tm), jnp.int32)
        )
        mt = cfg.max_time
        w_max = (
            jnp.round(length.astype(jnp.float32) * mt).astype(jnp.int32)
            if 0 < mt < 1.0
            else jnp.asarray(int(mt), jnp.int32)
        )
        n_cap = cfg.max_time_masks if 0 < tm < 1.0 else int(tm)
        tmask = _mask_axis(r_t, n_cap, n_time, cfg.min_time, w_max, T, length)
        return fmask, tmask

    rngs = jax.random.split(rng, B)
    fmask, tmask = jax.vmap(one)(rngs, feat_lens)
    masked = fmask[:, :, None] | tmask[:, None, :]
    return jnp.where(masked, 0.0, feats)


def stack_subsample_frames(
    feats: jax.Array,
    feat_lens: jax.Array,
    stacking: int = 1,
    subsampling: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Stack `stacking` consecutive frames along features, subsample in time.

    feats: [B, M, T] -> [B, M * stacking, ceil(T / subsampling)].
    Matches reference semantics (features.py:119-141): frame t gets frames
    [t, t+1, ..., t+stacking-1] (zero-padded past the end), then every
    `subsampling`-th frame is kept.
    """
    B, M, T = feats.shape
    if stacking > 1 or subsampling > 1:
        parts = [feats]
        for n in range(1, stacking):
            shifted = jnp.pad(feats[:, :, n:], ((0, 0), (0, 0), (0, n)))
            parts.append(shifted)
        feats = jnp.concatenate(parts, axis=1)[:, :, ::subsampling]
        if subsampling > 1:
            feat_lens = -(-feat_lens // subsampling)
    return feats, feat_lens


def stack_time(x: jax.Array, x_lens: jax.Array, factor: int) -> Tuple[jax.Array, jax.Array]:
    """StackTime between encoder stages (reference: rnnt/model.py:35-49).

    x: [T, B, H] -> [ceil(T/factor) (after slicing stride), B, H*factor];
    frame t of the output stacks input frames [t*factor + i], zero-padded
    past T. Lengths become ceil(len / factor).
    """
    T, B, H = x.shape
    parts = [x]
    for i in range(1, factor):
        shifted = jnp.pad(x[i:], ((0, i), (0, 0), (0, 0)))
        parts.append(shifted)
    out = jnp.concatenate(parts, axis=2)[::factor]
    return out, -(-x_lens // factor)
