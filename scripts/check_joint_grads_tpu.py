"""On-device numeric check of the fused joint kernels vs a float64 host ref.

The CPU test suite runs the kernels in Pallas interpreter mode; this script
compiles the REAL Mosaic kernels on the attached TPU and checks fwd values
and all three grads at a reduced-N, full-K shape (both model vocab widths),
in three backward modes (f32 recompute / fully-fused / auto stored-u).

Gate design: with bf16 inputs every TPU path — the Pallas kernels AND plain
XLA — does bf16 MXU GEMMs with f32 accumulation and returns bf16 dh/dw, so
kernel-vs-XLA differences of ~bf16-eps relative to tensor scale are
unavoidable rounding, not bugs (observed ~6e-3 max on real hardware even in
the f32-recompute mode). Instead both are compared against an exact float64
numpy reference: the kernel passes if its error is within a small factor of
XLA's own error against the same ref. A logic bug (dropped tile, wrong
one-hot column, bad slab offset) perturbs grads by O(1), orders of magnitude
above that gate; shared bf16 rounding sits right at it.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_joint_grads_tpu.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import caiman_asr_tpu.ops.pallas_joint as pj  # noqa: E402
from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse  # noqa: E402


def ref_impl(h, w, b, labels, blank):
    z = h.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(z, axis=1)
    lp = z - lse[:, None]
    n = jnp.arange(h.shape[0])
    return lp[:, blank], lp[n, labels]


def ref_f64(h, w, b, labels, blank, cb, cl):
    """Exact loss + grads on host in float64 (closed-form softmax grad)."""
    h64 = np.asarray(h.astype(jnp.float32), np.float64)
    w64 = np.asarray(w.astype(jnp.float32), np.float64)
    b64 = np.asarray(b, np.float64)
    cb64 = np.asarray(cb, np.float64)
    cl64 = np.asarray(cl, np.float64)
    lab = np.asarray(labels)
    z = h64 @ w64 + b64
    zmax = z.max(axis=1, keepdims=True)
    e = np.exp(z - zmax)
    se = e.sum(axis=1, keepdims=True)
    lse = np.log(se)[:, 0] + zmax[:, 0]
    n = np.arange(z.shape[0])
    loss = float(np.sum(cb64 * (z[:, blank] - lse) + cl64 * (z[n, lab] - lse)))
    # d loss / d z[n,j] = cb*delta_blank + cl*delta_label - (cb+cl)*softmax
    dz = -(cb64 + cl64)[:, None] * (e / se)
    dz[n, lab] += cl64
    dz[:, blank] += cb64
    return loss, (dz @ w64.T, h64.T @ dz, dz.sum(axis=0))


def _errs(got, ref64):
    a = np.asarray(got, np.float32).astype(np.float64)
    scale = np.abs(ref64).max() + 1e-12
    err = np.abs(a - ref64) / scale
    return err.max(), err.mean()


def check(name, Hj, K, mode, factor):
    N = 4096  # reduced positions: full-K kernel grids, quick compile
    key = jax.random.PRNGKey(7)
    kh, kw, kl = jax.random.split(key, 3)
    h = (jax.random.normal(kh, (N, Hj), jnp.float32) * 0.1).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (Hj, K), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b = jnp.zeros((K,), jnp.float32)
    labels = jax.random.randint(kl, (N,), 0, K - 1)
    blank = K - 1
    cb = jax.random.normal(kh, (N,), jnp.float32) * 0.5
    cl = jax.random.normal(kw, (N,), jnp.float32) * 0.5

    def loss_fused(h, w, b):
        lb, ll = fused_joint_lse(h, w, b, labels, blank)
        return jnp.sum(cb * lb + cl * ll)

    def loss_ref(h, w, b):
        lb, ll = ref_impl(h, w, b, labels, blank)
        return jnp.sum(cb * lb + cl * ll)

    vf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))(h, w, b)
    vr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(h, w, b)
    v64, g64 = ref_f64(h, w, b, labels, blank, cb, cl)
    vf, vr = float(vf), float(vr)
    rel_f = abs(vf - v64) / max(abs(v64), 1e-9)
    rel_x = abs(vr - v64) / max(abs(v64), 1e-9)
    print(f"{name}/{mode}: loss fused={vf:.4f} xla={vr:.4f} f64={v64:.4f} "
          f"rel(fused)={rel_f:.2e} rel(xla)={rel_x:.2e}")
    ok = rel_f < max(factor * rel_x, 1e-5)
    for nm, a, x, r in zip(("dh", "dw", "db"), gf, gr, g64):
        kmax, kmean = _errs(a, r)
        xmax, xmean = _errs(x, r)
        line_ok = kmax <= max(factor * xmax, 1e-5) and kmean <= max(
            factor * xmean, 1e-6
        )
        print(f"  {nm}: kernel max/mean {kmax:.2e}/{kmean:.2e}  "
              f"xla {xmax:.2e}/{xmean:.2e}  {'ok' if line_ok else 'FAIL'}")
        ok &= line_ok
    print(f"{name}/{mode}: {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ok = True
    for mode in ("f32", "fused", "auto", "i8"):
        pj._ZSTORE_DTYPE = "auto"
        if mode == "f32":
            pj.Z_STORE_LIMIT_BYTES = 0
            pj.RECHUNK_LIMIT_BYTES = 0
            pj.FUSED_BWD = False
            factor = 3.0  # f32 dz recompute: same precision class as XLA
        elif mode == "fused":
            # the one-kernel backward (71 MB VMEM dW accumulator at large)
            pj.Z_STORE_LIMIT_BYTES = 0
            pj.RECHUNK_LIMIT_BYTES = 0
            pj.FUSED_BWD = True
            factor = 3.0  # recomputes u fresh per tile, no slab residual
        elif mode == "i8":
            # scaled-int8 slab: a deliberately lossy storage mode (the
            # large-vocab HBM fallback). The gate here only screens for
            # LOGIC bugs (O(1) perturbations); the printed numbers ARE the
            # measured precision cost the docs cite.
            pj.Z_STORE_LIMIT_BYTES = 1 << 62
            pj.RECHUNK_LIMIT_BYTES = 0
            pj.FUSED_BWD = False
            pj._ZSTORE_DTYPE = "i8"
            factor = 200.0
        else:
            pj.Z_STORE_LIMIT_BYTES = 5120 << 20
            pj.RECHUNK_LIMIT_BYTES = 512 << 20
            pj.FUSED_BWD = True
            factor = 10.0  # bf16 u slab adds an independent rounding step
        jax.clear_caches()
        for name, (Hj, K) in {"base": (768, 8704), "large": (1024, 17408)}.items():
            ok &= check(name, Hj, K, mode, factor)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
