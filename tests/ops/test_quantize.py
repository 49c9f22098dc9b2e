"""Quantizer tests (reference: lib tests of quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.quantize import (
    bfp_quantize,
    brain_float_quantize,
    brainfloat16,
    ste,
)


def test_brainfloat_matches_bfloat16():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=1000).astype(np.float32) * 100)
    q = brainfloat16(x)
    expected = x.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(q), np.asarray(expected), rtol=1e-7)


def test_brainfloat_preserves_zero_and_sign():
    x = jnp.asarray([0.0, -1.5, 1.5, -1e-30])
    q = brain_float_quantize(x, 8, 7)
    assert float(q[0]) == 0.0
    assert float(q[1]) == -1.5 and float(q[2]) == 1.5


def test_bfp_shared_exponent():
    # within a block, values are snapped to a grid set by the block max
    x = jnp.asarray([[1.0, 0.5, 0.26, 0.003]])
    q = bfp_quantize(x, man_bits=4, axis=-1)
    step = 1.0 / 8  # max=1.0 -> scale 2^3
    np.testing.assert_allclose(np.asarray(q), np.round(np.asarray(x) / step) * step,
                               atol=1e-7)


@pytest.mark.slow
def test_bfp_blocks():
    x = jnp.asarray([[100.0, 0.1, 0.1, 0.1]])
    # one block: the small values are crushed by 100's shared exponent
    q1 = bfp_quantize(x, man_bits=4, axis=-1)
    err1 = float(jnp.abs(q1 - x)[0, 1:].max())
    # two blocks of 2: the second block keeps its own exponent
    q2 = bfp_quantize(x, man_bits=4, axis=-1, block=2)
    err2 = float(jnp.abs(q2 - x)[0, 2:].max())
    assert err1 > 0.09  # 0.1 snapped to 0
    assert err2 < 0.01


@pytest.mark.slow
def test_ste_gradient_identity():
    """STE: forward value is q(x); gradient flows as identity, so
    d/dx sum(q(x)^2) = 2*q(x)."""
    x = jnp.asarray([1.3, -2.7])
    g = jax.grad(lambda x: jnp.sum(ste(x, brainfloat16) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g), 2.0 * np.asarray(brainfloat16(x)), rtol=1e-6
    )
