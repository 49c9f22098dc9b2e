"""Automatic encoder batch-size reduction
(reference: rnnt/unbatch_encoder.py:14-47,
docs/src/training/automatic_batch_size_reduction.md).

Long-utterance validation batches can blow past device memory in the
encoder; instead of failing, split the batch so that
``T * B_sub * in_feats <= max_inputs_per_batch`` (default 1e7) and run the
encoder in slices. Slices reuse one jit compilation when equal-sized.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def compute_sub_batch_size(T: int, B: int, feat: int, max_inputs: float) -> int:
    """Largest per-slice batch honouring the element budget (>= 1)."""
    if T * feat <= 0:
        return B
    b = int(max_inputs // (T * feat))
    return max(1, min(B, b))


def encode_lower_batch_size(
    model, params, feats, feat_lens, max_inputs_per_batch: float = 1e7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run model.encode over batch slices. feats: [T, B, F] time-major."""
    T, B, F = feats.shape
    sub = compute_sub_batch_size(T, B, F, max_inputs_per_batch)
    if sub >= B:
        encs, enc_lens, _ = model.encode(params, feats, feat_lens)
        return encs, enc_lens
    out_encs, out_lens = [], []
    for start in range(0, B, sub):
        sl = slice(start, min(start + sub, B))
        # pad the tail slice to `sub` so every slice shares one compilation
        fe = feats[:, sl]
        fl = feat_lens[sl]
        pad = sub - fe.shape[1]
        if pad:
            fe = jnp.pad(fe, ((0, 0), (0, pad), (0, 0)))
            fl = jnp.pad(fl, (0, pad))
        e, el, _ = model.encode(params, fe, fl)
        out_encs.append(np.asarray(e)[: sl.stop - sl.start])
        out_lens.append(np.asarray(el)[: sl.stop - sl.start])
    return (
        jnp.asarray(np.concatenate(out_encs, axis=0)),
        jnp.asarray(np.concatenate(out_lens, axis=0)),
    )
