"""Bandwidth-minimal LAMB finish step.

The post-gradient tail of the train step — nan-guard, grad-norm metric,
global-norm clip, LAMB (adam + weight decay + trust ratio + lr schedule +
per-module lr factors), EMA, and the atomic non-finite skip — costs
~76 ms/step at large-196M B=96 when expressed as the optax chain plus
per-tree ``where`` selects: every transform in the chain is its own full
pass over the 196M-param tree, and the select-based skip re-reads three
trees (params, EMA, adam moments) twice more.  The same math organised as
three fused passes is ~10 GB of HBM traffic (~13 ms at v5e bandwidth):

  pass 0  read grads            -> per-leaf sumsq  (grad norm + clip scale)
  pass 1  read g, mu, nu, p     -> write mu', nu'; per-leaf ||p||, ||u||
          (the LAMB update u is computed in-register and discarded)
  pass 2  read mu', nu', p, ema -> write p', ema'
          (u is recomputed from mu', nu' — pure ALU, no extra bytes)

The non-finite skip folds into passes 1-2 as a scalar predicate instead of
post-hoc tree selects, and the optimizer state is written back into the
exact optax ``chain(clip, lamb, factors)`` state structure, so checkpoints
and resume are bit-compatible with the optax path.

Semantics match optax exactly (same clip trigger/select, adam bias
correction with post-increment count, trust-ratio zero-norm guard,
schedule evaluated at the PRE-increment count); pinned by
tests/training/test_fused_finish.py which drives both paths side by side.

Reference parallel: apex ``FusedLAMB`` (train_utils/build_optimizer.py:
10-32) is the same idea on CUDA — one fused multi-tensor kernel instead of
a chain of elementwise ops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from caiman_asr_tpu.training.optimizer import OptimizerConfig


class UnsupportedOptState(Exception):
    """The optimizer state does not look like build_optimizer's chain."""


def _walk_states(s, found):
    """Collect (in traversal order) the ScaleByAdamState and
    ScaleByScheduleState instances inside a chain state tuple."""
    if isinstance(s, optax.ScaleByAdamState):
        found.setdefault("adam", []).append(s)
        return
    if isinstance(s, optax.ScaleByScheduleState):
        found.setdefault("sched", []).append(s)
        return
    if isinstance(s, tuple) and not hasattr(s, "_fields"):
        for x in s:
            _walk_states(x, found)


def _rebuild(s, adam_new, sched_new):
    """Return ``s`` with the (unique) adam / schedule states replaced."""
    if isinstance(s, optax.ScaleByAdamState):
        return adam_new
    if isinstance(s, optax.ScaleByScheduleState):
        return sched_new
    if isinstance(s, tuple) and not hasattr(s, "_fields"):
        return tuple(_rebuild(x, adam_new, sched_new) for x in s)
    return s


def extract_opt_state(opt_state):
    """(adam_state, sched_state) from a build_optimizer chain state, or
    raise UnsupportedOptState."""
    found: Dict[str, list] = {}
    _walk_states(opt_state, found)
    if len(found.get("adam", [])) != 1 or len(found.get("sched", [])) != 1:
        raise UnsupportedOptState(
            f"expected exactly one adam + one schedule state, found "
            f"{ {k: len(v) for k, v in found.items()} }"
        )
    return found["adam"][0], found["sched"][0]


def _leaf_factor_tree(params, lr_factors: Optional[Dict[str, float]]):
    """Per-leaf scalar multiplier tree from the per-top-level-module map."""
    if not lr_factors:
        return jax.tree.map(lambda _: 1.0, params)
    return {
        k: jax.tree.map(lambda _, f=float(lr_factors.get(k, 1.0)): f, v)
        for k, v in params.items()
    }


def fused_lamb_ema_update(
    params,
    ema_params,
    opt_state,
    grads,
    good: jax.Array,
    cfg: OptimizerConfig,
    lr_factors: Optional[Dict[str, float]],
    schedule,
    ema_decay: float,
):
    """One fused LAMB + EMA + gated-skip update.

    ``good`` is a scalar bool: when False the returned params / EMA /
    moments / counts are the inputs unchanged (the optax path's
    ``where``-select semantics, folded into the update arithmetic).

    Returns (new_params, new_ema, new_opt_state, grad_norm) where
    ``grad_norm`` is the post-nan-guard, PRE-clip global norm (the metric
    the train step logs).
    """
    adam_s, sched_s = extract_opt_state(opt_state)
    mu, nu, count = adam_s.mu, adam_s.nu, adam_s.count
    sched_count = sched_s.count

    b1, b2 = cfg.beta1, cfg.beta2
    eps = cfg.eps
    wd = cfg.weight_decay
    f32 = jnp.float32
    goodf = good.astype(f32)

    # pass 0: grad norm (post nan_to_num, pre clip) ----------------------
    gsq = jax.tree.map(
        lambda g: jnp.sum(jnp.square(jnp.nan_to_num(g.astype(f32)))), grads
    )
    grad_norm = jnp.sqrt(
        sum(jax.tree.leaves(gsq), jnp.zeros((), f32))
    )
    if cfg.clip_norm is not None:
        max_norm = f32(cfg.clip_norm)
        trigger = grad_norm < max_norm
        clip_s = jnp.where(trigger, jnp.ones((), f32), max_norm / grad_norm)
    else:
        clip_s = jnp.ones((), f32)

    count_inc = optax.safe_increment(count)
    bc1 = 1.0 - b1 ** count_inc.astype(f32)
    bc2 = 1.0 - b2 ** count_inc.astype(f32)

    def _u(mu2, nu2, p):
        """The LAMB update direction (pre trust/lr) — pure ALU."""
        mu_hat = mu2 / bc1
        nu_hat = nu2 / bc2
        return mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p.astype(f32)

    # pass 1: moments + per-leaf norms -----------------------------------
    def p1(g, m, v, p):
        gc = jnp.nan_to_num(g.astype(f32)) * clip_s
        mu2 = b1 * m + (1.0 - b1) * gc
        nu2 = b2 * v + (1.0 - b2) * jnp.square(gc)
        u = _u(mu2, nu2, p)
        # gate the moment write by `good` with a scalar-predicate select:
        # the arithmetic form `v + goodf*(nu2 - v)` makes NaN via 0*inf
        # when an inf grad (nan_to_num -> ~3.4e38, squared -> inf) reaches
        # nu2 with clipping disabled. Same HBM traffic, no 0*inf.
        mu_out = jnp.where(good, mu2, m)
        nu_out = jnp.where(good, nu2, v)
        pn2 = jnp.sum(jnp.square(p.astype(f32)))
        un2 = jnp.sum(jnp.square(u))
        return mu_out, nu_out, pn2, un2

    out1 = jax.tree.map(p1, grads, mu, nu, params)
    mu_new = jax.tree.map(lambda o: o[0], out1, is_leaf=lambda x: isinstance(x, tuple))
    nu_new = jax.tree.map(lambda o: o[1], out1, is_leaf=lambda x: isinstance(x, tuple))
    pn2_t = jax.tree.map(lambda o: o[2], out1, is_leaf=lambda x: isinstance(x, tuple))
    un2_t = jax.tree.map(lambda o: o[3], out1, is_leaf=lambda x: isinstance(x, tuple))

    # schedule at the PRE-increment count (optax scale_by_schedule)
    lr = schedule(sched_count).astype(f32)
    factors = _leaf_factor_tree(params, lr_factors)
    ema_d = f32(ema_decay)

    # pass 2: apply + EMA ------------------------------------------------
    def p2(m2, v2, p, e, pn2, un2, factor):
        u = _u(m2, v2, p)
        pn = jnp.sqrt(pn2)
        un = jnp.sqrt(un2)
        zero = jnp.logical_or(pn == 0.0, un == 0.0)
        trust = jnp.where(zero, jnp.ones((), f32), pn / un)
        # when ~good, mu/nu were not updated, so u is the STALE direction —
        # the goodf gate zeroes the step, keeping p and ema unchanged.
        step = (-lr * factor * trust * goodf) * u
        p2_ = (p.astype(f32) + step).astype(p.dtype)
        e2 = e + goodf * ((1.0 - ema_d) * (p2_.astype(f32) - e.astype(f32))).astype(e.dtype)
        return p2_, e2

    out2 = jax.tree.map(p2, mu_new, nu_new, params, ema_params, pn2_t, un2_t, factors)
    p_new = jax.tree.map(lambda o: o[0], out2, is_leaf=lambda x: isinstance(x, tuple))
    e_new = jax.tree.map(lambda o: o[1], out2, is_leaf=lambda x: isinstance(x, tuple))

    # safe_increment saturates at the dtype max (optax semantics): a
    # checkpoint with saturated counts must not wrap negative and flip the
    # bias-correction sign.
    adam_new = optax.ScaleByAdamState(
        count=jnp.where(good, optax.safe_increment(count), count),
        mu=mu_new,
        nu=nu_new,
    )
    sched_new = optax.ScaleByScheduleState(
        count=jnp.where(good, optax.safe_increment(sched_count), sched_count)
    )
    opt_new = _rebuild(opt_state, adam_new, sched_new)
    return p_new, e_new, opt_new, grad_norm


def probe_supported(opt_state) -> bool:
    """Trace-time check that the state matches build_optimizer's chain."""
    try:
        extract_opt_state(opt_state)
        return True
    except UnsupportedOptState:
        return False


__all__ = [
    "fused_lamb_ema_update",
    "probe_supported",
    "extract_opt_state",
    "UnsupportedOptState",
]
