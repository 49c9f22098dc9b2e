"""FPGA-numerics emulation quantizers
(reference: lib/src/rnnt_ext/custom_lstm/quantize.py:9-70, built on qtorch).

Self-contained JAX fake-quantisation:
- ``brain_float_quantize``: round to a custom FP(exp, man) format (the
  reference's BrainFloatQuantizer; exp=8, man=7 = bfloat16);
- ``bfp_quantize``: block floating point — a shared exponent per block along
  one axis, mantissas rounded to ``man`` bits (BfpQuantizer).

Both are straight-through-estimator friendly (wrap with
``ste(x, quantizer)``) so they can run inside training to emulate
deployment arithmetic (config ``quantize: true``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def brain_float_quantize(x: jax.Array, exp_bits: int = 8, man_bits: int = 7):
    """Round-to-nearest-even into FP(exp_bits, man_bits) with IEEE-style
    exponent range; values beyond the format saturate."""
    x = jnp.asarray(x, jnp.float32)
    bias = (1 << (exp_bits - 1)) - 1
    max_exp = bias
    min_exp = 1 - bias  # smallest normal exponent

    mant, expo = _frexp(x)
    # frexp returns mant in [0.5, 1); convert to [1, 2) convention
    expo = expo - 1
    expo_c = jnp.clip(expo, min_exp, max_exp)
    scale = jnp.exp2(man_bits - expo_c.astype(jnp.float32))
    q = jnp.round(x * scale) / scale
    # saturate to the max representable magnitude
    max_val = (2.0 - 2.0 ** (-man_bits)) * 2.0**max_exp
    q = jnp.clip(q, -max_val, max_val)
    return jnp.where(x == 0.0, 0.0, q)


def bfp_quantize(x: jax.Array, man_bits: int = 8, axis: int = -1, block: int = 0):
    """Block floating point: shared exponent = exponent of the block max;
    mantissas rounded to man_bits (reference BfpQuantizer quantises along a
    dim with a shared exponent)."""
    x = jnp.asarray(x, jnp.float32)
    if block and x.shape[axis] % block == 0:
        # reshape into blocks along the axis
        moved = jnp.moveaxis(x, axis, -1)
        shp = moved.shape
        blocked = moved.reshape(shp[:-1] + (shp[-1] // block, block))
        q = _bfp_last_axis(blocked, man_bits)
        return jnp.moveaxis(q.reshape(shp), -1, axis)
    moved = jnp.moveaxis(x, axis, -1)
    q = _bfp_last_axis(moved, man_bits)
    return jnp.moveaxis(q, -1, axis)


def _bfp_last_axis(x, man_bits):
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    _, e = _frexp(absmax)
    scale = jnp.exp2((man_bits - 1) - e.astype(jnp.float32))
    scale = jnp.where(absmax == 0.0, 1.0, scale)
    return jnp.clip(
        jnp.round(x * scale), -(2.0 ** (man_bits - 1)), 2.0 ** (man_bits - 1) - 1
    ) / scale


def _frexp(x):
    """Portable frexp: mantissa in [0.5, 1), integer exponent."""
    ax = jnp.abs(x)
    e = jnp.where(ax > 0, jnp.floor(jnp.log2(ax)) + 1, 0).astype(jnp.int32)
    m = jnp.where(ax > 0, ax / jnp.exp2(e.astype(jnp.float32)), 0.0)
    # guard numerical edge: m must be < 1
    fix = m >= 1.0
    e = e + fix.astype(jnp.int32)
    m = jnp.where(fix, m / 2.0, m)
    return m, e


def ste(x: jax.Array, quantizer) -> jax.Array:
    """Straight-through estimator: quantized forward, identity backward."""
    return x + jax.lax.stop_gradient(quantizer(x) - x)


brainfloat16 = partial(brain_float_quantize, exp_bits=8, man_bits=7)
