"""Parity tests for the wavefront multi-layer LSTM kernel.

Reference semantics: the per-layer scan stack (ops/lstm.run_lstm_layer
with CAIMAN_PALLAS_LSTM disabled at these shapes on CPU), layer by
layer with explicit inter-layer dropout masks. The wavefront kernel must
reproduce hidden/cell streams and all gradients.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.lstm import init_lstm_layer, run_lstm_layer
from caiman_asr_tpu.ops.pallas_wavefront import run_lstm_stack_wavefront

jax.config.update("jax_enable_x64", False)


def make_stack(key, G, H, I0, dtype=jnp.float32):
    keys = jax.random.split(key, G)
    params = []
    for l in range(G):
        params.append(
            init_lstm_layer(keys[l], I0 if l == 0 else H, H, dtype=dtype)
        )
    return params


def ref_stack(params, x, h0, c0, *, hard=False, masks=None):
    """Layer-by-layer scan reference with explicit inter-layer masks."""
    out = x
    ys_all, cs_all = [], []
    for l, p in enumerate(params):
        if l > 0 and masks is not None:
            out = out * masks[l - 1].astype(out.dtype)
        ys, cs = run_lstm_layer(p, out, h0[l], c0[l], hard=hard)
        ys_all.append(ys)
        cs_all.append(cs)
        out = ys
    return jnp.stack(ys_all, 0), jnp.stack(cs_all, 0)


@pytest.mark.parametrize("G", [2, 3])
@pytest.mark.parametrize("hard", [False, True])
def test_forward_parity(G, hard):
    T, B, H, I0 = 11, 8, 128, 64
    key = jax.random.PRNGKey(0)
    params = make_stack(key, G, H, I0)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, I0), jnp.float32)
    h0 = jnp.zeros((G, B, H))
    c0 = jnp.zeros((G, B, H))

    ys_ref, cs_ref = ref_stack(params, x, h0, c0, hard=hard)
    ys, cs = run_lstm_stack_wavefront(
        params, x, h0, c0, hard=hard, t_blk=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_nonzero_state_and_odd_tblk():
    G, T, B, H, I0 = 2, 9, 8, 128, 128
    params = make_stack(jax.random.PRNGKey(3), G, H, I0)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, I0))
    h0 = jax.random.normal(jax.random.PRNGKey(5), (G, B, H)) * 0.3
    c0 = jax.random.normal(jax.random.PRNGKey(6), (G, B, H)) * 0.3
    ys_ref, cs_ref = ref_stack(params, x, h0, c0)
    ys, cs = run_lstm_stack_wavefront(params, x, h0, c0, t_blk=2,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("G", [2, 3])
@pytest.mark.parametrize("store_gates", [True, False])
def test_grad_parity(G, store_gates):
    T, B, H, I0 = 7, 8, 128, 128
    params = make_stack(jax.random.PRNGKey(7), G, H, I0)
    x = jax.random.normal(jax.random.PRNGKey(8), (T, B, I0))
    h0 = jax.random.normal(jax.random.PRNGKey(9), (G, B, H)) * 0.2
    c0 = jax.random.normal(jax.random.PRNGKey(10), (G, B, H)) * 0.2
    # cotangents hit every layer's ys AND cs (mirrors RSP state extraction)
    wy = jax.random.normal(jax.random.PRNGKey(11), (G, T, B, H))
    wc = jax.random.normal(jax.random.PRNGKey(12), (G, T, B, H))

    def loss_ref(params, x, h0, c0):
        ys, cs = ref_stack(params, x, h0, c0)
        return jnp.sum(ys * wy) + jnp.sum(cs * wc)

    def loss_wf(params, x, h0, c0):
        ys, cs = run_lstm_stack_wavefront(
            params, x, h0, c0, t_blk=4, interpret=True,
            store_gates=store_gates)
        return jnp.sum(ys * wy) + jnp.sum(cs * wc)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, x, h0, c0)
    g_wf = jax.grad(loss_wf, argnums=(0, 1, 2, 3))(params, x, h0, c0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_wf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_dropout_parity():
    """Wavefront with in-kernel masks == per-layer reference with the same
    masks applied explicitly, forward and grads."""
    G, T, B, H, I0 = 3, 6, 8, 128, 128
    dropout = 0.4
    params = make_stack(jax.random.PRNGKey(13), G, H, I0)
    x = jax.random.normal(jax.random.PRNGKey(14), (T, B, I0))
    h0 = jnp.zeros((G, B, H))
    c0 = jnp.zeros((G, B, H))
    rngs = [jax.random.PRNGKey(100 + i) for i in range(G - 1)]
    masks = [
        jnp.where(jax.random.bernoulli(k, 1.0 - dropout, (T, B, H)),
                  1.0 / (1.0 - dropout), 0.0)
        for k in rngs
    ]

    def loss_ref(params, x):
        ys, cs = ref_stack(params, x, h0, c0, masks=masks)
        return jnp.sum(ys * 0.01) + jnp.sum(cs * 0.02), (ys, cs)

    def loss_wf(params, x):
        ys, cs = run_lstm_stack_wavefront(
            params, x, h0, c0, t_blk=4, dropout=dropout, rngs=rngs,
            interpret=True)
        return jnp.sum(ys * 0.01) + jnp.sum(cs * 0.02), (ys, cs)

    (l_ref, (ys_ref, _)), g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1), has_aux=True)(params, x)
    (l_wf, (ys_wf, _)), g_wf = jax.value_and_grad(
        loss_wf, argnums=(0, 1), has_aux=True)(params, x)
    np.testing.assert_allclose(np.asarray(ys_wf), np.asarray(ys_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l_wf), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_wf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_last_layer_only_cotangent():
    """Typical encoder use: loss touches only the top layer's output."""
    G, T, B, H, I0 = 2, 10, 8, 128, 128
    params = make_stack(jax.random.PRNGKey(20), G, H, I0)
    x = jax.random.normal(jax.random.PRNGKey(21), (T, B, I0))
    h0 = jnp.zeros((G, B, H))
    c0 = jnp.zeros((G, B, H))

    def loss_ref(params):
        ys, _ = ref_stack(params, x, h0, c0)
        return jnp.sum(jnp.tanh(ys[-1]))

    def loss_wf(params):
        ys, _ = run_lstm_stack_wavefront(params, x, h0, c0, t_blk=4,
                                         interpret=True)
        return jnp.sum(jnp.tanh(ys[-1]))

    g_ref = jax.grad(loss_ref)(params)
    g_wf = jax.grad(loss_wf)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_wf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)
