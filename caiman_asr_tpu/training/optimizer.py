"""LAMB optimizer with per-module LR factors + global-norm clipping.

TPU-native replacement for apex ``FusedLAMB``
(training/caiman_asr_train/train_utils/build_optimizer.py:10-32). The
reference builds one torch param group per top-level module with
``lr * lr_factor`` each (rnnt/model.py:121-127,449-459); since LAMB applies
the learning rate *after* the trust-ratio normalisation, a per-group lr is
exactly a per-group multiplier on the final update — implemented here as an
optax transform keyed on the top-level parameter-tree key.

Chain: clip_by_global_norm(clip_norm) -> optax.lamb(schedule, betas, eps,
weight_decay) -> scale_by_module_lr_factors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    """Defaults mirror the reference CLI (args/train.py:118-151)."""

    lr: float = 4e-3
    min_lr: float = 4e-4
    weight_decay: float = 1e-2
    clip_norm: Optional[float] = 1.0
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-9
    warmup_steps: int = 1632
    hold_steps: int = 18000
    half_life_steps: int = 10880
    ema: float = 0.999


def scale_by_module_lr_factors(factors: Dict[str, float]) -> optax.GradientTransformation:
    """Multiply updates of top-level subtree ``k`` by ``factors.get(k, 1.0)``."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = {
            k: jax.tree.map(lambda u, f=factors.get(k, 1.0): u * f, v)
            for k, v in updates.items()
        }
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


# Registry threading (cfg, lr_factors, schedule) from build_optimizer to
# the train step's fused finish path (training/fused_finish.py) without
# changing the GradientTransformation signature every caller holds.
# Identity-keyed: GradientTransformation is a NamedTuple (no attributes,
# no weakrefs). Bounded: a process builds a handful of optimizers.
_FUSED_SPECS: list = []


def fused_spec_for(tx):
    """(cfg, lr_factors, schedule) for a build_optimizer result, else None."""
    for t, cfg, factors, schedule in _FUSED_SPECS:
        if t is tx:
            return cfg, factors, schedule
    return None


def build_optimizer(
    cfg: OptimizerConfig,
    lr_factors: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """Build the full update chain. ``lr_factors`` comes from
    ``RNNT.param_lr_factors()`` (reference model.py:121-127)."""
    from caiman_asr_tpu.training.lr import lr_schedule

    schedule = lr_schedule(
        cfg.lr, cfg.min_lr, cfg.warmup_steps, cfg.hold_steps, cfg.half_life_steps
    )
    chain = []
    if cfg.clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    chain.append(
        optax.lamb(
            learning_rate=schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    )
    if lr_factors and any(f != 1.0 for f in lr_factors.values()):
        chain.append(scale_by_module_lr_factors(lr_factors))
    tx = optax.chain(*chain)
    _FUSED_SPECS.append((tx, cfg, dict(lr_factors or {}), schedule))
    return tx
