"""Pallas LSTM kernel parity vs the scan implementation (forward + VJP).

Runs in Pallas interpreter mode on CPU; on a real TPU the same code paths
compile to Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.lstm import init_lstm_layer, run_lstm_layer
from caiman_asr_tpu.ops.pallas_lstm import pallas_eligible, run_lstm_layer_pallas

T, B, I, H = 12, 8, 16, 32


@pytest.fixture(scope="module")
def setup():
    params = init_lstm_layer(jax.random.PRNGKey(0), I, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, I)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)) * 0.1, jnp.float32)
    return params, x, h0, c0


@pytest.mark.parametrize("hard", [False, True])
def test_forward_parity(setup, hard):
    params, x, h0, c0 = setup
    ys_ref, cs_ref = run_lstm_layer(params, x, h0, c0, hard=hard)
    ys, cs = run_lstm_layer_pallas(params, x, h0, c0, hard=hard, t_blk=4,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_ref), atol=2e-5)


def test_forward_unpadded_tail(setup):
    """T not divisible by t_blk pads internally and trims."""
    params, x, h0, c0 = setup
    ys_ref, _ = run_lstm_layer(params, x[:10], h0, c0)
    ys, _ = run_lstm_layer_pallas(params, x[:10], h0, c0, t_blk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("hard", [False, True])
def test_gradient_parity(setup, hard):
    params, x, h0, c0 = setup

    def loss_scan(p, x, h0, c0):
        ys, cs = run_lstm_layer(p, x, h0, c0, hard=hard)
        return jnp.sum(ys * jnp.cos(jnp.arange(ys.size).reshape(ys.shape))) + 0.3 * jnp.sum(cs**2)

    def loss_pallas(p, x, h0, c0):
        ys, cs = run_lstm_layer_pallas(p, x, h0, c0, hard=hard, t_blk=4,
                                       interpret=True)
        return jnp.sum(ys * jnp.cos(jnp.arange(ys.size).reshape(ys.shape))) + 0.3 * jnp.sum(cs**2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(params, x, h0, c0)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(params, x, h0, c0)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_eligibility():
    assert pallas_eligible(B=32, H=1024, t_blk=4, dtype=jnp.bfloat16)
    # the large-encoder width fits now that the real ~128 MB VMEM is used
    # (the 16 MB figure was only Mosaic's default scoped-vmem limit)
    assert pallas_eligible(B=32, H=1536, t_blk=4, dtype=jnp.bfloat16)
    # w_hh alone is 256 MB here — beyond physical VMEM
    assert not pallas_eligible(B=32, H=4096, t_blk=8, dtype=jnp.float32)


@pytest.mark.parametrize("hard", [False, True])
def test_store_gates_parity(setup, hard):
    """store_gates=True must match the recompute path exactly: fwd outputs
    AND all four gradients (the stored pre-activations carry the same
    compute-dtype precision the recompute path streams)."""
    params, x, h0, c0 = setup

    def loss(p, x, h0, c0, sg):
        ys, cs = run_lstm_layer_pallas(p, x, h0, c0, hard=hard, t_blk=4,
                                       interpret=True, store_gates=sg)
        return (
            jnp.sum(ys * jnp.cos(jnp.arange(ys.size).reshape(ys.shape)))
            + 0.3 * jnp.sum(cs**2)
        )

    ys_a, cs_a = run_lstm_layer_pallas(params, x, h0, c0, hard=hard, t_blk=4,
                                       interpret=True, store_gates=True)
    ys_b, cs_b = run_lstm_layer_pallas(params, x, h0, c0, hard=hard, t_blk=4,
                                       interpret=True, store_gates=False)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    np.testing.assert_array_equal(np.asarray(cs_a), np.asarray(cs_b))

    g_sg = jax.grad(loss, argnums=(0, 1, 2, 3))(params, x, h0, c0, True)
    g_rc = jax.grad(loss, argnums=(0, 1, 2, 3))(params, x, h0, c0, False)
    for a, b in zip(jax.tree.leaves(g_sg), jax.tree.leaves(g_rc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_store_gates_unpadded_tail(setup):
    params, x, h0, c0 = setup
    ys_ref, _ = run_lstm_layer(params, x[:10], h0, c0)
    ys, _ = run_lstm_layer_pallas(params, x[:10], h0, c0, t_blk=4,
                                  interpret=True, store_gates=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-5)
