"""Fuzzy top-k logits: emulate the accelerator's blockwise argmax.

Reference: rnnt/fuzzy_logits.py:8-75. The deployed accelerator reduces the
logits in packets of 8 vectors x 32 lanes, keeping per-lane maxima over the
8 vectors; the host argmax then only sees those maxima. Emulated here by
broadcasting each batch row's minimum onto every value that is not its
packet-lane maximum.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_topk_logits(logits: jnp.ndarray, vecs_in_pkt: int = 8, vec_size: int = 32):
    B, H = logits.shape
    assert H % (vecs_in_pkt * vec_size) == 0, (
        f"vocab size {H} not divisible by {vecs_in_pkt}x{vec_size}"
    )
    r = logits.reshape(B, -1, vecs_in_pkt, vec_size)
    mx = r.max(axis=2, keepdims=True)
    mn = logits.min(axis=1, keepdims=True)[:, :, None, None]
    keep = r == mx
    return jnp.where(keep, r, mn).reshape(B, H)
