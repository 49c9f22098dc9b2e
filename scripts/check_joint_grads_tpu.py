"""On-device numeric check of the fused joint kernels vs plain XLA.

The CPU test suite runs the kernels in Pallas interpreter mode; this script
compiles the REAL Mosaic kernels on the attached TPU and checks fwd values
and all three grads against an XLA reference at a reduced-N, full-K shape
(both model vocab widths), in two backward modes:

- f32 recompute (ZSTORE=0, RECHUNK=0): tight tolerance — any logic bug
  (wrong one-hot column, dropped tile) fails loudly here.
- default auto mode (stored-u / rechunked bf16 u): normalized-to-max
  tolerance — bf16 numerators carry ~2^-9 relative error per term, so
  near-zero elements legitimately have large POINT-WISE relative error;
  what must stay small is the error relative to the tensor's scale.

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


def check(name, Hj, K, mode):
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
    vf, vr = float(vf), float(vr)
    rel_v = abs(vf - vr) / max(abs(vr), 1e-9)
    print(f"{name}/{mode}: loss fused={vf:.4f} ref={vr:.4f} rel={rel_v:.2e}")
    ok = rel_v < 1e-3
    # normalized error: |a - r| relative to the tensor's own scale
    # fused recomputes u fresh per tile (no bf16 slab residual): same
    # numerics class as the per-pass recompute
    max_tol = 1e-4 if mode in ("f32", "fused") else 5e-3
    mean_tol = 1e-5 if mode in ("f32", "fused") else 1e-4
    for nm, a, r in zip(("dh", "dw", "db"), gf, gr):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        scale = np.abs(r).max() + 1e-9
        err = np.abs(a - r) / scale
        print(f"  {nm}: max norm-err {err.max():.2e}  mean {err.mean():.2e}")
        ok &= err.max() < max_tol and err.mean() < mean_tol
    print(f"{name}/{mode}: {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ok = True
    for mode in ("f32", "fused", "auto"):
        if mode == "f32":
            pj.Z_STORE_LIMIT_BYTES = 0
            pj.RECHUNK_LIMIT_BYTES = 0
            pj.FUSED_BWD = False
        elif mode == "fused":
            # the one-kernel backward (71 MB VMEM dW accumulator at large)
            pj.Z_STORE_LIMIT_BYTES = 0
            pj.RECHUNK_LIMIT_BYTES = 0
            pj.FUSED_BWD = True
        else:
            pj.Z_STORE_LIMIT_BYTES = 5120 << 20
            pj.RECHUNK_LIMIT_BYTES = 512 << 20
            pj.FUSED_BWD = True
        jax.clear_caches()
        for name, (Hj, K) in {"base": (768, 8704), "large": (1024, 17408)}.items():
            ok &= check(name, Hj, K, mode)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
