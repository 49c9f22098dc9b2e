"""Checkpoint save/load/average (reference: export/checkpointer.py:20-231,
export/checkpoint_averaging.py:17-120).

Format: a single ``.npz`` per checkpoint containing
- ``params/<slash/joined/path>`` and ``ema/<path>`` — named weight arrays
  (loadable without a template, enabling fine-tune / partial / averaging),
- ``opt/<i>`` — optimizer-state leaves in ``jax.tree`` flatten order
  (restored into a freshly initialised opt-state template, the standard JAX
  pattern; a structure fingerprint guards against mismatches),
- ``meta`` — JSON blob {epoch, step, best_wer, tokenizer_kw,
  logmel_norm_weight, ...} (reference payload, checkpointer.py:92-104).

Matching reference behaviours: tracked per-step checkpoints, ``last.npz`` /
``best.npz`` symlink-style copies, corrupted-last fallback
(checkpointer.py:144-156), ``--fine_tune`` weights-only loads vs ``--resume``
full loads, ``allow_partial`` loads (checkpointer.py:158-196).
"""

from __future__ import annotations

import io
import json
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ pytree io
def flatten_named(tree, prefix="") -> Dict[str, np.ndarray]:
    """Flatten a nested dict-of-arrays into {'a/b/c': array}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_named(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_named(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_named(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of flatten_named (always rebuilds dicts, incl. numeric keys)."""
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return root


def _tree_fingerprint(tree) -> str:
    leaves = jax.tree.leaves(tree)
    return f"{len(leaves)}:" + ",".join(
        f"{np.asarray(l).shape}{np.asarray(l).dtype}" for l in leaves[:64]
    )


# --------------------------------------------------------------- save / load
def save_checkpoint(
    path: str | Path,
    params,
    ema_params=None,
    opt_state=None,
    meta: Optional[Dict[str, Any]] = None,
    extra: Optional[Dict[str, np.ndarray]] = None,
):
    """Atomically write one checkpoint file. ``extra``: named auxiliary
    arrays (e.g. the RSP carried RNNT state) stored under ``extra/`` —
    ignored by weight loaders, read back via :func:`load_extra`."""
    path = Path(path)
    payload: Dict[str, np.ndarray] = {}
    for k, v in flatten_named(jax.device_get(params)).items():
        payload[f"params/{k}"] = v
    if ema_params is not None:
        for k, v in flatten_named(jax.device_get(ema_params)).items():
            payload[f"ema/{k}"] = v
    for k, v in (extra or {}).items():
        payload[f"extra/{k}"] = np.asarray(jax.device_get(v))
    meta = dict(meta or {})
    if opt_state is not None:
        leaves = jax.tree.leaves(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            payload[f"opt/{i}"] = np.asarray(leaf)
        meta["_opt_fingerprint"] = _tree_fingerprint(opt_state)
    payload["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)
    return path


def load_extra(path: str | Path) -> Dict[str, np.ndarray]:
    """The ``extra/`` auxiliary arrays of a checkpoint (empty if none)."""
    with np.load(path) as z:
        return {
            k[len("extra/"):]: z[k] for k in z.keys() if k.startswith("extra/")
        }


def load_checkpoint(
    path: str | Path,
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]], Optional[List[np.ndarray]], Dict]:
    """Returns (params, ema_params_or_None, opt_leaves_or_None, meta)."""
    with np.load(path) as z:
        keys = list(z.keys())
        meta = json.loads(bytes(z["meta"]).decode("utf-8")) if "meta" in keys else {}
        params = unflatten_named(
            {k[len("params/"):]: z[k] for k in keys if k.startswith("params/")}
        )
        ema_flat = {k[len("ema/"):]: z[k] for k in keys if k.startswith("ema/")}
        ema = unflatten_named(ema_flat) if ema_flat else None
        opt_keys = sorted(
            (k for k in keys if k.startswith("opt/")), key=lambda k: int(k[4:])
        )
        opt_leaves = [z[k] for k in opt_keys] if opt_keys else None
    return params, ema, opt_leaves, meta


def restore_opt_state(template_opt_state, opt_leaves: List[np.ndarray]):
    """Rebuild the optax state from saved leaves + a fresh template."""
    treedef = jax.tree.structure(template_opt_state)
    t_leaves = jax.tree.leaves(template_opt_state)
    if len(t_leaves) != len(opt_leaves):
        raise ValueError(
            f"optimizer state mismatch: template has {len(t_leaves)} leaves, "
            f"checkpoint has {len(opt_leaves)}"
        )
    cast = [
        jnp.asarray(saved, np.asarray(t).dtype)
        for saved, t in zip(opt_leaves, t_leaves)
    ]
    return jax.tree.unflatten(treedef, cast)


def apply_params(template_params, loaded, allow_partial: bool = False):
    """Replace template leaves by loaded values, by name.

    With allow_partial, missing keys keep template values (reference
    ``--allow_partial_checkpoint``, checkpointer.py:158-196); extra keys in
    the checkpoint always error.
    """
    t_flat = flatten_named(template_params)
    l_flat = flatten_named(loaded)
    extra = set(l_flat) - set(t_flat)
    # training-only heads (pruned-loss simple projections) are expected
    # extras when loading a pruned-trained checkpoint for val/serving
    ignorable = {k for k in extra if k.split("/")[0] in ("simple_am", "simple_lm")}
    extra -= ignorable
    if extra:
        raise ValueError(f"checkpoint has unknown parameters: {sorted(extra)[:8]}")
    missing = set(t_flat) - set(l_flat)
    if missing and not allow_partial:
        raise ValueError(
            f"checkpoint is missing parameters: {sorted(missing)[:8]} "
            "(pass allow_partial=True to keep fresh values)"
        )
    out = {}
    for k, tv in t_flat.items():
        if k in l_flat:
            lv = l_flat[k]
            if tuple(lv.shape) != tuple(np.asarray(tv).shape):
                raise ValueError(f"shape mismatch for {k}: {lv.shape} vs {np.asarray(tv).shape}")
            out[k] = jnp.asarray(lv, np.asarray(tv).dtype)
        else:
            out[k] = tv
    return unflatten_named(out)


# -------------------------------------------------------------- Checkpointer
class Checkpointer:
    """Directory-level checkpoint manager (reference export/checkpointer.py:20).

    Files: ``step{N}.npz`` (tracked), ``last.npz``, ``best.npz``.
    """

    STEP_RE = re.compile(r"step(\d+)\.npz$")

    def __init__(self, save_dir: str | Path, model_name: str = "RNN-T"):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.tracked: Dict[int, Path] = {
            int(m.group(1)): p
            for p in sorted(self.save_dir.glob("step*.npz"))
            if (m := self.STEP_RE.search(p.name))
        }

    def _payload_meta(self, epoch, step, best_wer, meta):
        out = {"epoch": int(epoch), "step": int(step), "best_wer": float(best_wer)}
        out.update(meta or {})
        return out

    def save(
        self,
        params,
        ema_params,
        opt_state,
        epoch: int,
        step: int,
        best_wer: float,
        *,
        is_best: bool = False,
        is_last: bool = False,
        meta: Optional[Dict[str, Any]] = None,
        extra: Optional[Dict[str, np.ndarray]] = None,
    ) -> Path:
        m = self._payload_meta(epoch, step, best_wer, meta)
        if is_best:
            path = self.save_dir / "best.npz"
        elif is_last:
            path = self.save_dir / "last.npz"
        else:
            path = self.save_dir / f"step{step}.npz"
            self.tracked[step] = path
        return save_checkpoint(path, params, ema_params, opt_state, m, extra)

    def last_checkpoint(self) -> Optional[Path]:
        """Newest loadable checkpoint; skips corrupted files
        (reference checkpointer.py:144-156)."""
        candidates = [self.save_dir / "last.npz"] + [
            self.tracked[s] for s in sorted(self.tracked, reverse=True)
        ]
        for p in candidates:
            if p.is_file():
                try:
                    load_checkpoint(p)
                    return p
                except Exception:
                    print(f"WARNING: checkpoint {p} appears corrupted; skipping")
        return None

    def load_for_resume(self, path, params_tmpl, ema_tmpl, opt_tmpl):
        """Full restore: weights + EMA + optimizer + meta (``--resume``)."""
        params, ema, opt_leaves, meta = load_checkpoint(path)
        new_params = apply_params(params_tmpl, params)
        new_ema = apply_params(ema_tmpl, ema) if ema is not None else new_params
        new_opt = (
            restore_opt_state(opt_tmpl, opt_leaves) if opt_leaves is not None else opt_tmpl
        )
        return new_params, new_ema, new_opt, meta

    def load_for_fine_tune(self, path, params_tmpl, allow_partial=False):
        """Weights-only restore (``--fine_tune``); EMA weights preferred if
        present (reference setup/train.py:102-134)."""
        params, ema, _, meta = load_checkpoint(path)
        src = ema if ema is not None else params
        return apply_params(params_tmpl, src, allow_partial=allow_partial), meta


def average_checkpoints(paths: List[str | Path]):
    """Average params (and EMA) across checkpoints
    (reference export/checkpoint_averaging.py:28-120)."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc_p, acc_e, meta0 = None, None, None
    n = len(paths)
    for p in paths:
        params, ema, _, meta = load_checkpoint(p)
        fp = flatten_named(params)
        fe = flatten_named(ema) if ema is not None else fp
        if acc_p is None:
            acc_p = {k: v.astype(np.float64) / n for k, v in fp.items()}
            acc_e = {k: v.astype(np.float64) / n for k, v in fe.items()}
            meta0 = meta
        else:
            if set(fp) != set(acc_p):
                raise ValueError("checkpoints have differing parameter sets")
            for k in acc_p:
                acc_p[k] += fp[k].astype(np.float64) / n
                acc_e[k] += fe[k].astype(np.float64) / n
    params = unflatten_named({k: v.astype(np.float32) for k, v in acc_p.items()})
    ema = unflatten_named({k: v.astype(np.float32) for k, v in acc_e.items()})
    return params, ema, meta0
