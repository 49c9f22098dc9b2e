"""Pre-compile the engine tick at the bench ladder's batch sizes.

Kernel compiles over the remote-TPU tunnel take 5-8 min each and are cached
server-side across processes; bench.py's 565 s budget can absorb at most one
cold rung per invocation. Running this once makes every ladder rung warm so
a single bench.py run measures the whole ladder.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/warm_bench_rungs.py [B ...]
"""
import sys
import time

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    import bench

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
