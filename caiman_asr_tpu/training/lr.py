"""Learning-rate policy: warmup -> hold -> exponential half-life decay.

Matches the reference policy (training/caiman_asr_train/train_utils/lr.py:16-49):
  a = (step+1)/(warmup+1)                       for step <  warmup
  a = 1                                         for step <  warmup + hold
  a = 0.5 ** ((step - warmup - hold)/half_life) otherwise
  lr = max(a * initial_lr, min_lr)

Implemented as a jax-traceable schedule so it can live inside the jitted
optimizer update (optax schedule callable).
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_schedule(
    initial_lr: float,
    min_lr: float,
    warmup_steps: int,
    hold_steps: int,
    half_life_steps: int,
):
    """Return an optax-style schedule fn: step (int array) -> lr (float array)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1.0) / (warmup_steps + 1.0)
        decay = 0.5 ** ((step - warmup_steps - hold_steps) / half_life_steps)
        a = jnp.where(
            step < warmup_steps,
            warm,
            jnp.where(step < warmup_steps + hold_steps, 1.0, decay),
        )
        return jnp.maximum(a * initial_lr, min_lr)

    return schedule
