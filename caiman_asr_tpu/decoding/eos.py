"""EOS decoding strategies (reference: rnnt/eos_strategy.py, decoder.py:141-160)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax.numpy as jnp

NEG_INF = -1.0e30


@dataclass(frozen=True)
class EOSIgnore:
    eos_idx: int


@dataclass(frozen=True)
class EOSBlank:
    eos_idx: int


@dataclass(frozen=True)
class EOSPredict:
    eos_idx: int
    alpha: float = 1.0
    beta: float = 0.0


EOSStrategy = Union[None, EOSIgnore, EOSBlank, EOSPredict]


def apply_eos_strategy(logprobs: jnp.ndarray, strategy: EOSStrategy, blank_idx: int):
    """Adjust normalized logprobs [.., K] per strategy (static dispatch)."""
    if strategy is None:
        return logprobs
    if isinstance(strategy, EOSIgnore):
        return logprobs.at[..., strategy.eos_idx].set(NEG_INF)
    if isinstance(strategy, EOSBlank):
        merged = jnp.logaddexp(
            logprobs[..., blank_idx], logprobs[..., strategy.eos_idx]
        )
        out = logprobs.at[..., blank_idx].set(merged)
        return out.at[..., strategy.eos_idx].set(NEG_INF)
    if isinstance(strategy, EOSPredict):
        v = logprobs[..., strategy.eos_idx] * strategy.alpha
        if strategy.beta > 0:
            v = jnp.where(v > jnp.log(strategy.beta), v, NEG_INF)
        return logprobs.at[..., strategy.eos_idx].set(v)
    raise TypeError(f"unknown EOS strategy {strategy!r}")
