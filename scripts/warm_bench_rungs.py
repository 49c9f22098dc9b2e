"""Pre-compile the engine tick at the bench ladder's batch sizes.

Kernel compiles over the remote-TPU tunnel take 5-8 min each; bench.py's
565 s budget can absorb at most one cold rung per invocation. This script
compiles every program bench.py will run and persists the executables into
the DURABLE repo-local JAX compilation cache (`/root/repo/.tpu_cache`,
committed to git) so any later process — including the driver's official
bench run — deserializes each rung in milliseconds instead of recompiling.

RITUAL: run this (full ladder) after ANY commit that touches engine /
kernel / featurizer / model code, then run `python bench.py` and check the
emitted line is nonzero, then `git add .tpu_cache && git commit`. Round-3's
official bench recorded 0.0 precisely because this was skipped after the
last engine commit.

Usage: python scripts/warm_bench_rungs.py [B ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    # never let a CPU fallback (tunnel down) write machine-specific CPU
    # executables into the shared, git-committed TPU cache
    platform = bench._detect_platform()
    if platform != "tpu":
        raise SystemExit(
            f"refusing to warm: platform is {platform!r}, not tpu — a CPU "
            "fallback would pollute .tpu_cache with host-specific entries"
        )
    bench.setup_compile_cache(platform)
    # the ladder rungs + the tunnel tier (2048); measure_compute's
    # pipeline_depth=0 program at 16384 is shape-identical to the rung's.
    sizes = [int(a) for a in sys.argv[1:]] or [
        16384, 14336, 12288, 8192, 4096, 2048]

    for B in sizes:
        t0 = time.time()
        eng = bench._build_engine(B, pipeline_depth=8)
        for lane in range(B):
            eng.open_stream()
        eng.warmup()
        block = np.zeros((B, eng.hop_samples), np.int16)
        for _ in range(3):
            eng.push_audio_block(block)
            eng.tick()
        eng.close()
        print(f"B={B}: warm in {time.time() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
