"""Vocab-parallel joint+LSE == single-device fused_joint_lse (fwd + grads),
on a CPU mesh with the vocab sharded over 'model'.

Gradients are taken INSIDE the shard_map body (the supported pattern, same
as training/step.make_train_step_tp.grads_body) — differentiating THROUGH
shard_map is not part of the module's contract (see _vp_vjp_bwd)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse
from caiman_asr_tpu.parallel.vocab_parallel import vp_joint_lse

N, Hj, K = 70, 16, 2048  # K divisible by n_model shards
BLANK = K - 1  # lives on the LAST shard (exercises shard-offset paths)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices (CPU mesh via conftest)")
    return Mesh(np.array(devs[:4]), ("model",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(N, Hj)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(Hj, K)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, K - 1, (N,)), jnp.int32)
    cb = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    return h, w, b, labels, cb, cl


def _ref_loss(blank, labels, cb, cl):
    def ref(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    return ref


def _vp_value_and_grads(mesh, blank, labels, cb, cl):
    """value + (dh, dw, db), with grad taken inside the sharded body."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model")),
        out_specs=(P(), P(), P(None, "model"), P("model")),
        check_vma=False,
    )
    def sharded(h, w, b):
        def loss(h, w, b):
            lb, ll = vp_joint_lse(h, w, b, labels, blank, "model", True)
            return jnp.sum(lb * cb) + jnp.sum(ll * cl)

        val, (dh, dw, db) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            h, w, b
        )
        return val, dh, dw, db

    return sharded


@pytest.mark.slow
def test_vp_forward_parity(mesh, data):
    h, w, b, labels, cb, cl = data
    ref = _ref_loss(BLANK, labels, cb, cl)(h, w, b)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model")),
        out_specs=P(), check_vma=False,
    )
    def fwd(h, w, b):
        lb, ll = vp_joint_lse(h, w, b, labels, BLANK, "model", True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    np.testing.assert_allclose(float(fwd(h, w, b)), float(ref), rtol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("blank", [K - 1, K // 2 + 3], ids=["last", "mid"])
def test_vp_grad_parity(mesh, data, blank):
    """blank on the final and on an interior shard; labels span all shards."""
    h, w, b, labels, cb, cl = data

    g_ref = jax.grad(_ref_loss(blank, labels, cb, cl), argnums=(0, 1, 2))(
        h, w, b
    )
    val, dh, dw, db = _vp_value_and_grads(mesh, blank, labels, cb, cl)(
        h, w, b
    )
    np.testing.assert_allclose(
        float(val), float(_ref_loss(blank, labels, cb, cl)(h, w, b)),
        rtol=2e-5,
    )
    # stored-u is on per-shard (tiny slabs) -> stored-u tolerances
    for a, r in zip((dh, dw, db), g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-3, rtol=1e-3
        )
