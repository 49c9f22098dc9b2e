"""A/B the wavefront multi-layer LSTM kernel vs the per-layer Pallas path.

Times, on the attached chip, a G-layer stack at encoder shapes:
  - per-layer kernel (ops/pallas_lstm via ops/lstm.run_lstm_layer)
  - wavefront kernel (ops/pallas_wavefront), forward and fwd+bwd.

Usage: python scripts/bench_wavefront.py [--large] [-B 96] [-T 200] [-G 2]
           [--t-blk 4] [--layers pre|post]
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


def timeit(fn, *args, warmup=2, iters=10):
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
    ap.add_argument("--large", action="store_true")
    ap.add_argument("-B", type=int, default=96)
    ap.add_argument("-T", type=int, default=200)
    ap.add_argument("-G", type=int, default=2)
    ap.add_argument("--t-blk", type=int, default=4)
    ap.add_argument("--i0", type=int, default=0, help="layer-0 input width")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from caiman_asr_tpu.ops.lstm import init_lstm_layer, run_lstm_layer
    from caiman_asr_tpu.ops.pallas_wavefront import run_lstm_stack_wavefront

    H = 1536 if args.large else 1024
    I0 = args.i0 or H
    B, T, G = args.B, args.T, args.G
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, G)
    params = [
        init_lstm_layer(keys[l], I0 if l == 0 else H, H, dtype=jnp.float32)
        for l in range(G)
    ]
    params_bf = jax.tree.map(
        lambda p: p.astype(dtype) if p.ndim > 1 else p, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, I0), jnp.float32
                          ).astype(dtype)
    h0 = jnp.zeros((G, B, H), dtype)
    c0 = jnp.zeros((G, B, H), dtype)
    wy = jax.random.normal(jax.random.PRNGKey(2), (T, B, H), jnp.float32
                           ).astype(dtype)

    @jax.jit
    def perlayer_fwd(params, x):
        out = x
        for l in range(G):
            ys, cs = run_lstm_layer(params[l], out, h0[l], c0[l])
            out = ys
        return out

    @jax.jit
    def wavefront_fwd(params, x):
        ys, cs = run_lstm_stack_wavefront(params, x, h0, c0,
                                          t_blk=args.t_blk)
        return ys[-1]

    o1 = perlayer_fwd(params_bf, x)
    o2 = wavefront_fwd(params_bf, x)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"fwd max |diff| = {err:.3e}")
    t1 = timeit(lambda: perlayer_fwd(params_bf, x))
    t2 = timeit(lambda: wavefront_fwd(params_bf, x))
    print(f"G={G} H={H} B={B} T={T} t_blk={args.t_blk}")
    print(f"fwd  per-layer: {t1*1e3:8.2f} ms   wavefront: {t2*1e3:8.2f} ms "
          f"({t1/t2:.2f}x)")
    if args.fwd_only:
        return

    @jax.jit
    def perlayer_fb(params, x):
        def loss(params):
            out = x
            for l in range(G):
                out, _ = run_lstm_layer(params[l], out, h0[l], c0[l])
            return jnp.sum((out * wy).astype(jnp.float32))
        return jax.grad(loss)(params)

    @jax.jit
    def wavefront_fb(params, x):
        def loss(params):
            ys, _ = run_lstm_stack_wavefront(params, x, h0, c0,
                                             t_blk=args.t_blk)
            return jnp.sum((ys[-1] * wy).astype(jnp.float32))
        return jax.grad(loss)(params)

    g1 = perlayer_fb(params_bf, x)
    g2 = wavefront_fb(params_bf, x)
    rel = [
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
              / (1e-6 + jnp.max(jnp.abs(a.astype(jnp.float32)))))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2))
    ]
    print(f"grad max rel diff = {max(rel):.3e}")
    t1 = timeit(lambda: perlayer_fb(params_bf, x))
    t2 = timeit(lambda: wavefront_fb(params_bf, x))
    print(f"f+b  per-layer: {t1*1e3:8.2f} ms   wavefront: {t2*1e3:8.2f} ms "
          f"({t1/t2:.2f}x)")


if __name__ == "__main__":
    main()
