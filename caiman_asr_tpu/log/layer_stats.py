"""Per-layer weight/gradient statistics (reference: log/logging_layers.py
get_logging_entries, :13-50 — weight norm/std, grad norm/max/std per named
parameter, emitted to TB under per-layer-*/<name>).

All statistics are computed ON DEVICE inside the jitted train step as one
flat vector (5 scalars per parameter leaf), so enabling them adds a few
hundred cheap reductions and ONE extra host fetch per logged step — not a
per-leaf transfer loop.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

STATS = ("weight-norm", "weight-std", "grad-norm", "grad-max", "grad-std")


def _leaf_names(params) -> List[str]:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    names = []
    for path, _ in leaves:
        parts = []
        for k in path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        names.append(".".join(parts))
    return names


def layer_stat_names(params) -> List[str]:
    """TB-style metric names, 5 per parameter leaf, matching the layout of
    layer_stats_vec."""
    return [
        f"per-layer-{stat}/{name}"
        for name in _leaf_names(params)
        for stat in STATS
    ]


def layer_stats_vec(params, grads) -> jax.Array:
    """[5 * n_leaves] f32 vector of per-leaf (weight norm, weight std,
    grad norm, grad abs-max, grad std). Call inside the jitted step."""
    p_leaves = jax.tree_util.tree_leaves(params)
    g_leaves = jax.tree_util.tree_leaves(grads)
    vals = []
    for p, g in zip(p_leaves, g_leaves):
        p = p.astype(jnp.float32)
        g = g.astype(jnp.float32)
        vals.extend(
            [
                jnp.linalg.norm(p.reshape(-1)),
                jnp.std(p.reshape(-1)),
                jnp.linalg.norm(g.reshape(-1)),
                jnp.max(jnp.abs(g)),
                jnp.std(g.reshape(-1)),
            ]
        )
    return jnp.stack(vals)


def layer_stats_dict(names: List[str], vec) -> Dict[str, float]:
    import numpy as np

    arr = np.asarray(vec)
    return {n: float(v) for n, v in zip(names, arr)}
