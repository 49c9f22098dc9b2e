"""A/B the fused joint forward kernel variants on real TPU.

Historical note: a software-pipelined variant (CAIMAN_JOINT_FWD_PIPE) was
A/B'd here and lost (109.7 vs 89.1 ms at large) — removed from the kernels.

Timing forces a host fetch of a data-dependent scalar (block_until_ready is
dispatch-only over the axon tunnel).
"""
import argparse
import time

import jax
import jax.numpy as jnp

from caiman_asr_tpu.ops import pallas_joint as pj

SHAPES = {"base": (768, 8704), "large": (1024, 17408)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="large", choices=list(SHAPES))
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    Hj, K = SHAPES[args.shape]
    N = args.n

    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (N, Hj), jnp.bfloat16) * 0.1
    w = jax.random.normal(key, (Hj, K), jnp.bfloat16) * 0.02
    b = jnp.zeros((K,), jnp.float32)
    labels = jax.random.randint(key, (N,), 0, K - 1)

    @jax.jit
    def fwd(h, w, b):
        lp_b, lp_l = pj.fused_joint_lse(h, w, b, labels, K - 1)
        return jnp.sum(lp_b) + jnp.sum(lp_l)

    float(fwd(h, w, b))  # compile + settle
    float(fwd(h, w, b))
    t0 = time.perf_counter()
    acc = None
    for _ in range(args.iters):
        acc = fwd(h, w, b)
    val = float(acc)  # host fetch forces execution of the full chain... of
    # the LAST call only; chain them so every iter is on the fetch path
    t_naive = (time.perf_counter() - t0) / args.iters * 1e3

    @jax.jit
    def fwd_chained(carry, h, w, b):
        lp_b, lp_l = pj.fused_joint_lse(h + carry * 0, w, b, labels, K - 1)
        return jnp.sum(lp_b) + jnp.sum(lp_l)

    c = jnp.float32(0)
    float(fwd_chained(c, h, w, b))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(args.iters):
        c = fwd_chained(c * 1e-30, h, w, b)
    val = float(c)
    t_chain = (time.perf_counter() - t0) / args.iters * 1e3

    print(
        f"shape={args.shape} N={N}: "
        f"fwd {t_chain:.2f} ms/iter chained ({t_naive:.2f} dispatch-loop), "
        f"val={val:.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
