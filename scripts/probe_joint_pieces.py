"""Micro-probe of the joint+loss forward pieces at large-196M B=96.

bench_train reports joint+loss fwd = ~210 ms; the in-kernel GEMM roofline
is ~143 ms. This separates: (a) the fused_joint_lse kernel alone,
(b) hidden formation relu(f+g), (c) the label/blank gathered dots,
(d) the lattice alpha recursion given scores.

Usage: python scripts/probe_joint_pieces.py [-B 96]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=96)
    ap.add_argument("-U", type=int, default=40)
    ap.add_argument("-T", type=int, default=200)
    args = ap.parse_args()

    from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse, _forward
    from caiman_asr_tpu.ops.transducer_loss import transducer_loss_from_fg

    B, T, U1 = args.B, args.T, args.U + 1
    Hj, K = 1024, 17408
    N = B * T * U1
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(B, T, Hj)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, U1, Hj)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(Hj, K)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K,)) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, K - 2, (N,)), jnp.int32)
    blank = K - 1

    h = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :]).reshape(N, Hj)
    h = jax.device_put(h)

    # (a) full fused forward (kernel + gathered dots)
    fwd = jax.jit(lambda h: fused_joint_lse(h, w, b, labels, blank))
    t_a = timeit(fwd, h)
    print(f"fused_joint_lse (kernel + dots):   {t_a*1e3:7.1f} ms")

    # (a1) denominator kernel alone
    from caiman_asr_tpu.ops import pallas_joint as pj

    def denom_only(h):
        tp, kt = pj._tiles(Hj)[:2]
        Np = -(-N // tp) * tp
        hp = pj._pad_to(h, Np, 0)
        s, _ = pj._fwd_chunk(hp, w, b, 0, K, tp, kt, False, False)
        return s

    t_k = timeit(jax.jit(denom_only), h)
    print(f"  denominator kernel alone:        {t_k*1e3:7.1f} ms")

    # (a2) the gathered label/blank dots alone
    def dots(h):
        b32 = b.astype(jnp.float32)
        w_lab = w.T[labels]
        z_lab = (
            jnp.sum(h.astype(jnp.float32) * w_lab.astype(jnp.float32), axis=1)
            + b32[labels]
        )
        z_blank = (
            jnp.dot(h, w[:, blank], preferred_element_type=jnp.float32)
            + b32[blank]
        )
        return z_lab, z_blank

    t_d = timeit(jax.jit(dots), h)
    print(f"  gathered label/blank dots alone: {t_d*1e3:7.1f} ms")

    # (a3) einsum variant of the label dot (no f32 materialisation)
    def dots_einsum(h):
        b32 = b.astype(jnp.float32)
        w_lab = jnp.take(w, labels, axis=1).T  # [N, Hj] bf16
        z_lab = (
            jnp.einsum("nh,nh->n", h, w_lab,
                       preferred_element_type=jnp.float32)
            + b32[labels]
        )
        z_blank = (
            jnp.dot(h, w[:, blank], preferred_element_type=jnp.float32)
            + b32[blank]
        )
        return z_lab, z_blank

    t_e = timeit(jax.jit(dots_einsum), h)
    print(f"  einsum-variant dots:             {t_e*1e3:7.1f} ms")

    # (b) hidden formation
    t_h = timeit(jax.jit(
        lambda f, g: jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
        .reshape(N, Hj)), f, g)
    print(f"hidden relu(f+g) materialise:      {t_h*1e3:7.1f} ms")

    # (c) full loss fwd (for reference)
    f_lens = jnp.full((B,), T, jnp.int32)
    lab2 = jnp.asarray(rng.integers(0, K - 2, (B, args.U)), jnp.int32)
    u_lens = jnp.full((B,), args.U, jnp.int32)
    loss = jax.jit(lambda f, g: transducer_loss_from_fg(
        f, g, w, b, lab2, f_lens, u_lens, blank).sum())
    t_l = timeit(loss, f, g)
    print(f"transducer_loss_from_fg fwd:       {t_l*1e3:7.1f} ms")
    print(f"  implied lattice scan + misc:     {(t_l - t_a - t_h)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
