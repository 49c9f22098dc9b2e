"""Fused joint+LSE kernel parity (forward + custom VJP) vs plain JAX."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse

N, Hj, K = 70, 32, 600  # deliberately unaligned (padding paths exercised)
BLANK = K - 1


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(N, Hj)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(Hj, K)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, K - 1, (N,)), jnp.int32)
    return h, w, b, labels


def ref_impl(h, w, b, labels):
    z = h @ w + b
    denom = jax.nn.logsumexp(z, axis=-1)
    lp_b = z[:, BLANK] - denom
    lp_l = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0] - denom
    return lp_b, lp_l


def test_forward_parity(data):
    h, w, b, labels = data
    rb, rl = ref_impl(h, w, b, labels)
    fb, fl = fused_joint_lse(h, w, b, labels, BLANK, True)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(rb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(rl), atol=1e-5)


@pytest.mark.parametrize(
    "mode", ["stored", "stored_fused", "fused", "rechunk", "recompute",
             "stored_i8", "stored_fused_i8"]
)
def test_vjp_parity(data, monkeypatch, mode):
    """stored: forward keeps the bf16 u slab, two-kernel backward.
    stored_fused: same slab, passes A+B in ONE kernel (slab read once).
    fused: the one-kernel no-slab backward (derive + A + B per tile, dW
    accumulator resident in VMEM). rechunk: backward re-derives bf16 u
    per N-chunk. recompute: per-pass z re-derivation. The bf16-u slab
    paths carry ~2^-9 RELATIVE error on the softmax numerators, hence
    looser tolerances; the scaled-int8 slab (*_i8) quantizes at 1/254
    of the per-tile max numerator — a deliberately lossy mode (the
    large-vocab HBM fallback), tested at correspondingly wide bounds."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    monkeypatch.setattr(
        pj, "Z_STORE_LIMIT_BYTES",
        (1 << 62) if mode.startswith("stored") else 0,
    )
    monkeypatch.setattr(
        pj, "RECHUNK_LIMIT_BYTES", (1 << 62) if mode == "rechunk" else 0
    )
    monkeypatch.setattr(
        pj, "_ZSTORE_DTYPE", "i8" if mode.endswith("_i8") else "auto"
    )
    monkeypatch.setattr(
        pj, "FUSED_BWD", mode in ("fused", "stored_fused", "stored_fused_i8")
    )
    h, w, b, labels = data
    rng = np.random.default_rng(1)
    cb = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    def loss_ref(h, w, b):
        lb, ll = ref_impl(h, w, b, labels)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def loss_fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, BLANK, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(h, w, b)
    if mode.endswith("_i8"):
        atol, rtol = 5e-2, 5e-2
    elif mode == "recompute":
        atol, rtol = 2e-4, 1e-4
    else:
        atol, rtol = 2e-3, 1e-3
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=atol, rtol=rtol)


@pytest.mark.slow
def test_rechunked_multichunk_vjp_parity(monkeypatch):
    """Budget forces >1 N-chunk through the rechunked backward: 1536
    padded rows at K=600 (Kp=1024) with a 1 MiB budget -> 3 chunks of 512
    rows, dW/db accumulated across chunks, smear re-assembled in order."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    monkeypatch.setattr(pj, "Z_STORE_LIMIT_BYTES", 0)
    monkeypatch.setattr(pj, "RECHUNK_LIMIT_BYTES", 1 << 20)
    monkeypatch.setattr(pj, "FUSED_BWD", False)  # force the rechunk path
    rng = np.random.default_rng(7)
    n, hj, k = 1100, 16, 600
    blank = k - 1
    h = jnp.asarray(rng.normal(size=(n, hj)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hj, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (n,)), jnp.int32)
    cb = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    def ref(h, w, b):
        z = h @ w + b
        denom = jax.nn.logsumexp(z, axis=-1)
        lb = z[:, blank] - denom
        ll = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0] - denom
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(h, w, b)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(h, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_hybrid_split_vjp_parity(monkeypatch):
    """Budget forces a partial stored-u chunk: columns [0, 1024) stored,
    [1024, 2560) recomputed. Labels land in both chunks and blank in the
    recompute chunk, exercising the relative-index one-hot paths."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    # Np=512 rows x 2 B/col -> 1024 B/col; 1 MiB => 1024 columns (= one kt)
    monkeypatch.setattr(pj, "Z_STORE_LIMIT_BYTES", 1 << 20)
    monkeypatch.setattr(pj, "Z_STORE_PARTIAL", True)
    rng = np.random.default_rng(3)
    n, hj, k = 70, 16, 2560
    blank = k - 1
    h = jnp.asarray(rng.normal(size=(n, hj)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hj, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (n,)), jnp.int32)
    cb = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    def ref(h, w, b):
        z = h @ w + b
        denom = jax.nn.logsumexp(z, axis=-1)
        lb = z[:, blank] - denom
        ll = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0] - denom
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    np.testing.assert_allclose(float(fused(h, w, b)), float(ref(h, w, b)),
                               rtol=1e-5)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(h, w, b)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(h, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("mode", ["recompute", "fused"])
def test_recompute_large_tiles_cover_row_tail(monkeypatch, mode):
    """Large-shape tiles (Hj>=1024) have tp_a=512 < tp_b=1024: a padded row
    count aligned only to tp_a would make pass B's floor-divided grid DROP
    the last 512 rows from dW/db (silent wrong grads). N=1100 forces a row
    count that is not a 1024-multiple under tp_a-only alignment; both the
    per-pass recompute and the fused one-kernel backward must cover it."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    monkeypatch.setattr(pj, "Z_STORE_LIMIT_BYTES", 0)
    monkeypatch.setattr(pj, "RECHUNK_LIMIT_BYTES", 0)
    monkeypatch.setattr(pj, "FUSED_BWD", mode == "fused")
    rng = np.random.default_rng(5)
    n, hj, k = 1100, 1024, 600
    blank = k - 1
    h = jnp.asarray(rng.normal(size=(n, hj)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(hj, k)) * 0.03, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (n,)), jnp.int32)
    cb = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    def ref(h, w, b):
        z = h @ w + b
        denom = jax.nn.logsumexp(z, axis=-1)
        lb = z[:, blank] - denom
        ll = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0] - denom
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(h, w, b)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(h, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-4, rtol=3e-4)


def test_stored_u_nondividing_vocab(monkeypatch):
    """A custom vocab whose padded width the swept kt_b (3072) does not
    divide (K=3200 -> Kp=4096) must still run the default stored-u
    backward: tiles fall back to the largest dividing width instead of
    crashing (or silently dropping columns)."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    monkeypatch.setattr(pj, "Z_STORE_LIMIT_BYTES", 1 << 62)
    monkeypatch.setattr(pj, "FUSED_BWD", False)
    rng = np.random.default_rng(6)
    n, hj, k = 70, 16, 3200
    blank = k - 1
    h = jnp.asarray(rng.normal(size=(n, hj)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(hj, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (n,)), jnp.int32)
    cb = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    cl = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    def ref(h, w, b):
        z = h @ w + b
        denom = jax.nn.logsumexp(z, axis=-1)
        lb = z[:, blank] - denom
        ll = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0] - denom
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    def fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank, True)
        return jnp.sum(lb * cb) + jnp.sum(ll * cl)

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(h, w, b)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(h, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


def test_blank_in_nonfinal_tile():
    """blank index in the middle of the vocab still extracts correctly."""
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 1024)) * 0.1, jnp.float32)
    b = jnp.zeros((1024,), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1023, (16,)), jnp.int32)
    blank = 100
    z = h @ w + b
    denom = jax.nn.logsumexp(z, axis=-1)
    fb, fl = fused_joint_lse(h, w, b, labels, blank, True)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(z[:, blank] - denom),
                               atol=1e-5)
