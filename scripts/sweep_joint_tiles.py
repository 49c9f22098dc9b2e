"""Sweep position/vocab tile sizes for the fused joint kernels on real TPU.

Usage: python scripts/sweep_joint_tiles.py [--shape base|large] [--n N]
Times forward-only and forward+backward at each candidate tiling and prints
a ranked table. Used to pick the constants in ops/pallas_joint._tiles.
"""
import argparse
import time

import jax
import jax.numpy as jnp

from caiman_asr_tpu.ops import pallas_joint as pj

SHAPES = {
    "base": (768, 8704),
    "large": (1024, 17408),
}


def _fetch(out):
    """Host-fetch one scalar (block_until_ready is dispatch-only over the
    tunnelled axon backend — a host fetch is the only real barrier)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def time_fn(fn, *args, iters=20):
    _fetch(fn(*args))  # compile + settle
    _fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)  # device executes serially: bounds per-iter time + 1 RTT/N
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="base", choices=list(SHAPES))
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--cand", type=str, default=None,
                    help="single candidate 'tp_fwd,kt_fwd,tp_a,kt_a,tp_b,kt_b'"
                         " (run one per process: tile constants bind at"
                         " kernel build)")
    args = ap.parse_args()
    Hj, K = SHAPES[args.shape]
    N = args.n

    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (N, Hj), jnp.bfloat16) * 0.1
    w = jax.random.normal(key, (Hj, K), jnp.bfloat16) * 0.02
    b = jnp.zeros((K,), jnp.float32)
    labels = jax.random.randint(key, (N,), 0, K - 1)

# candidates: (tp_fwd, kt_fwd, tp_a, kt_a, tp_b, kt_b)
    cands = [
        (512, 1024, 512, 1024, 512, 512),   # original defaults
        (1024, 512, 512, 1024, 512, 512),
        (2048, 256, 512, 1024, 512, 512),
        (2048, 512, 512, 1024, 512, 512),
        (4096, 128, 512, 1024, 512, 512),
        (512, 1024, 1024, 512, 512, 512),
        (512, 1024, 1024, 256, 512, 512),
        (512, 1024, 2048, 256, 512, 512),
        (512, 1024, 512, 1024, 512, 1024),
        (512, 1024, 512, 1024, 1024, 512),
        (512, 1024, 512, 1024, 1024, 1024),
        (2048, 256, 1024, 256, 512, 1024),
    ]
    if args.cand:
        cands = [tuple(int(x) for x in args.cand.split(","))]
    results = []
    for c in cands:
        pj._tiles = lambda _hj, _c=c: _c
        if len(cands) > 1:
            jax.clear_caches()
        fwd = jax.jit(lambda h, w, b: pj.fused_joint_lse(h, w, b, labels, K - 1))

        def loss(h, w, b):
            lp_b, lp_l = pj.fused_joint_lse(h, w, b, labels, K - 1)
            return jnp.sum(lp_b) + 0.5 * jnp.sum(lp_l)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            tf = time_fn(fwd, h, w, b)
            tg = time_fn(grad, h, w, b)
            print(f"tiles={c}: fwd {tf:7.2f} ms   fwd+bwd {tg:7.2f} ms", flush=True)
            results.append((tg, tf, c))
        except Exception as e:  # VMEM OOM etc.
            print(f"tiles={c}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
    results.sort()
    print("\nbest by fwd+bwd:")
    for tg, tf, c in results[:5]:
        print(f"  {c}: fwd+bwd {tg:.2f} ms (fwd {tf:.2f})")


if __name__ == "__main__":
    main()
