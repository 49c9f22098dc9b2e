"""Attribute the p99 tail of the co-located engine tick at the headline B.

Runs the FULL StreamingEngine.tick() loop (upload-elided co-located tier,
same as bench.py's headline) for >=300 ticks with the engine's per-phase
probe enabled, then reports mean/p99 per phase and a per-phase breakdown of
the slowest 1% of ticks — so the tail is a measurement, not a guess.

Phases (tick thread): slot   = wait for a staging slot (upload backpressure)
                      stage  = native staging fill + rebase scan
                      wait   = blocked on the fetcher's device->host result
                      consume= host CPU deriving responses from fetched ticks
Phases (uploader thread, per dispatched tick):
                      up_samples = host->device staging copy (elided: ~0)
                      up_disp    = meta upload + jitted tick dispatch

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_tail_phases.py -B 12288
"""
import argparse
import gc
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(int(np.ceil(q * len(xs))) - 1, len(xs) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=12288)
    ap.add_argument("--ticks", type=int, default=320)
    ap.add_argument("--ship-upload", action="store_true",
                    help="really ship bytes (tunnel tier)")
    ap.add_argument("--gc-freeze", action="store_true",
                    help="disable the cyclic GC during the timed loop")
    ap.add_argument("--tokenizer", action="store_true",
                    help="serialize with realistic vocab pieces")
    ap.add_argument("--wire", action="store_true",
                    help="wire-response mode (bytes arena, no per-response "
                         "Python strings)")
    ap.add_argument("--pace", action="store_true",
                    help="fire ticks on the real-time 60 ms grid (serving "
                         "cadence) instead of back-to-back; reports lateness "
                         "vs the grid as well as wall time")
    args = ap.parse_args()
    B = args.B

    import jax  # noqa: F401

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _build_engine, _bench_tokenizer

    eng = _build_engine(
        B, tokenizer=_bench_tokenizer() if args.tokenizer else None,
        wire=args.wire,
    )
    eng._bench_reuse_upload = not args.ship_upload
    for _ in range(B):
        eng.open_stream()
    eng.warmup()
    rng = np.random.default_rng(0)
    block = (rng.standard_normal((B, eng.hop_samples)) * 0.05 * 32768).astype(
        np.int16
    )

    def one_tick():
        eng.push_audio_block(block)
        eng.tick()

    for _ in range(5):
        one_tick()
    eng._probe = {k: [] for k in (
        "slot", "stage", "wait", "consume", "total", "up_samples", "up_disp")}
    if args.gc_freeze:
        gc.freeze()
        gc.disable()
    walls = []
    stamps = []
    late = []
    period = 0.060
    grid0 = time.perf_counter() + period
    for i in range(args.ticks):
        if args.pace:
            deadline = grid0 + i * period
            now = time.perf_counter()
            if now < deadline:
                time.sleep(deadline - now)
        t0 = time.perf_counter()
        one_tick()
        t1 = time.perf_counter()
        walls.append(t1 - t0)
        stamps.append(t0)
        if args.pace:
            # lateness: how far past its grid slot this tick finished —
            # the real-time serving miss metric (0 = on time)
            late.append(max(0.0, t1 - (grid0 + i * period)))
    if args.gc_freeze:
        gc.enable()
    prb = eng._probe
    eng._probe = None
    eng.close()

    print(f"B={B} ticks={len(walls)} upload_elided={not args.ship_upload} "
          f"gc_freeze={args.gc_freeze} tokenizer={args.tokenizer} "
          f"wire={args.wire}")
    print(f"{'phase':12s} {'mean ms':>9s} {'p50 ms':>9s} {'p99 ms':>9s} {'max ms':>9s}")
    for k in ("slot", "stage", "wait", "consume", "total"):
        xs = prb[k]
        if not xs:
            continue
        print(f"{k:12s} {np.mean(xs)*1e3:9.2f} {pct(xs, .5)*1e3:9.2f} "
              f"{pct(xs, .99)*1e3:9.2f} {max(xs)*1e3:9.2f}")
    for k in ("up_samples", "up_disp"):
        xs = prb[k]
        if xs:
            print(f"{k:12s} {np.mean(xs)*1e3:9.2f} {pct(xs, .5)*1e3:9.2f} "
                  f"{pct(xs, .99)*1e3:9.2f} {max(xs)*1e3:9.2f}  (uploader thread)")
    xs = walls
    print(f"{'wall':12s} {np.mean(xs)*1e3:9.2f} {pct(xs, .5)*1e3:9.2f} "
          f"{pct(xs, .99)*1e3:9.2f} {max(xs)*1e3:9.2f}")
    if late:
        xs = late
        print(f"{'lateness':12s} {np.mean(xs)*1e3:9.2f} {pct(xs, .5)*1e3:9.2f} "
              f"{pct(xs, .99)*1e3:9.2f} {max(xs)*1e3:9.2f}  (vs 60 ms grid)")

    # slowest 1%: attribute each to its dominant phase
    n_tail = max(1, len(walls) // 100)
    order = np.argsort(walls)[::-1][:n_tail]
    print(f"\nslowest {n_tail} ticks (of {len(walls)}):")
    print(f"{'tick':>6s} {'wall':>8s} {'slot':>8s} {'stage':>8s} {'wait':>8s} "
          f"{'consume':>8s} {'gap':>8s}")
    for i in order:
        i = int(i)
        gap = (stamps[i] - stamps[i - 1] - walls[i - 1]) * 1e3 if i > 0 else 0.0
        row = [prb[k][i] * 1e3 if i < len(prb[k]) else float("nan")
               for k in ("slot", "stage", "wait", "consume")]
        print(f"{i:6d} {walls[i]*1e3:8.2f} {row[0]:8.2f} {row[1]:8.2f} "
              f"{row[2]:8.2f} {row[3]:8.2f} {gap:8.2f}")


if __name__ == "__main__":
    main()
