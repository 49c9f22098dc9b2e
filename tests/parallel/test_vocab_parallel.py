"""Vocab-parallel joint+LSE == single-device fused_joint_lse (fwd + grads),
run under shard_map on a CPU mesh with the vocab sharded over 'model'."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse
from caiman_asr_tpu.parallel.vocab_parallel import vp_joint_lse

N, Hj, K = 70, 16, 2048  # K divisible by n_model shards
BLANK = K - 1  # lives on the LAST shard (exercises shard-offset paths)


@pytest.fixture(scope="module")
def mesh():
    # model-only mesh: vp_joint_lse's contract is per-data-shard (inside the
    # train step each data row sees only its own batch shard; replicating a
    # full batch over 'data' would double-count dW in shard_map's transpose)
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


def _vp_loss_fn(mesh, labels, cb, cl, interpret=True):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model")),
        out_specs=P(),
        check_vma=False,
    )
    def sharded(h, w, b):
        lb, ll = vp_joint_lse(h, w, b, labels, BLANK, "model", interpret)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    return sharded


def test_vp_forward_parity(mesh, data):
    h, w, b, labels, cb, cl = data
    ref_lb, ref_ll = fused_joint_lse(h, w, b, labels, BLANK, True)
    ref = jnp.sum(ref_lb * cb) + jnp.sum(ref_ll * cl)
    got = _vp_loss_fn(mesh, labels, cb, cl)(h, w, b)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_vp_grad_parity(mesh, data):
    h, w, b, labels, cb, cl = data

    def ref_loss(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, BLANK, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(h, w, b)
    g_vp = jax.grad(_vp_loss_fn(mesh, labels, cb, cl), argnums=(0, 1, 2))(
        h, w, b
    )
    # stored-u is on per-shard (tiny slabs) -> stored-u tolerances
    for a, r in zip(g_vp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-3, rtol=1e-3
        )


def test_vp_blank_mid_vocab(mesh, data):
    """blank on an interior shard; labels include blank-shard columns."""
    h, w, b, labels, cb, cl = data
    blank = K // 2 + 3  # shard 1 of 2

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model")),
        out_specs=P(), check_vma=False,
    )
    def vp(h, w, b):
        lb, ll = vp_joint_lse(h, w, b, labels, blank, "model", True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def ref(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    np.testing.assert_allclose(float(vp(h, w, b)), float(ref(h, w, b)),
                               rtol=2e-5)
    g_ref = jax.grad(ref, argnums=(1, 2))(h, w, b)
    g_vp = jax.grad(vp, argnums=(1, 2))(h, w, b)
    for a, r in zip(g_vp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-3, rtol=1e-3
        )
