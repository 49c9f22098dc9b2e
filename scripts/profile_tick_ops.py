"""Per-op profile of the serving engine's jitted chunk program.

probe_tick_phases attributes the tick WALL (staging / upload / device /
fetch); this drills INTO the device portion: it builds the bench engine
at the target batch size, traces N chained device ticks with
jax.profiler, and runs the de-overlapped xplane analysis from
profile_step_ops — the honest per-op ranking of what the 55-63 ms
chunk program actually spends its time on (the algorithmic roofline is
~20 ms at B=16,384, so the attribution IS the round-6 serving target
list).

Usage: python scripts/profile_tick_ops.py [-B 16384] [--iters 5]
"""

import argparse
import glob
import gzip
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from scripts.profile_step_ops import analyze_xplane

    bench.setup_compile_cache(jax.devices()[0].platform)
    eng = bench._build_engine(args.B, pipeline_depth=0)
    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        (rng.standard_normal((args.B, eng.hop_samples)) * 0.05 * 32768)
        .astype(np.int16)
    )

    def make_meta(i):
        meta = np.zeros(3 * args.B + 1, np.int32)
        meta[: args.B] = 1
        meta[-1] = i
        return jnp.asarray(meta)

    carry, enc_state, dec_state = eng._carry, eng.enc_state, eng.dec_state
    for i in range(3):
        packed, carry, enc_state, dec_state = eng._jit_tick(
            eng.params, samples, carry, enc_state, dec_state, eng._init_dec,
            make_meta(i),
        )
    _ = np.asarray(packed)

    tracedir = tempfile.mkdtemp(prefix="tickprof_")
    jax.profiler.start_trace(tracedir)
    t0 = time.perf_counter()
    for i in range(args.iters):
        packed, carry, enc_state, dec_state = eng._jit_tick(
            eng.params, samples, carry, enc_state, dec_state, eng._init_dec,
            make_meta(100 + i),
        )
    _ = np.asarray(packed)
    wall = (time.perf_counter() - t0) / args.iters
    jax.profiler.stop_trace()
    print(f"traced {args.iters} ticks at B={args.B}, "
          f"{wall * 1e3:.1f} ms/tick wall (incl. one fetch)")

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found under", tracedir)
        return
    from jax.profiler import ProfileData

    with open(paths[0], "rb") as f:
        raw = f.read()
    try:
        pd = ProfileData.from_serialized_xspace(raw)
    except Exception:
        pd = ProfileData.from_serialized_xspace(gzip.decompress(raw))
    analyze_xplane(pd, args.iters, args.top)
    eng.close()


if __name__ == "__main__":
    main()
