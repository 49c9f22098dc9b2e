"""Serving endurance soak: lane churn through the REAL WebSocket server.

Round-5 evidence item: the engine's threads (uploader, fetcher, ticker),
native arenas (staging ring buffers, response serializer), and the
shadow-lane state-reset router have unit tests but no endurance proof.
This harness runs the real `caiman_asr_tpu.serving.server` CLI as a
subprocess and hammers it with open/stream/close client cycles —
including flood phases (many concurrent clients, faster-than-realtime
sends that exercise the TCP backpressure path) — while sampling the
server process's RSS and open-fd count and each cycle's response
latency. A leak in any of the per-stream resources shows up as a
monotonic RSS/fd ramp; latency drift shows up in the per-window
percentiles.

Phases (default --minutes 60 splits evenly):
  1. greedy + state resets (--sr_segment 15 --sr_overlap 3)
  2. beam-4 + state resets (production pruning thresholds)

PASS criteria printed at the end: post-warmup RSS slope < --rss-slope-mb
MB/h, fd count returns to its post-warmup level, and the last window's
p50 latency within 3x the first window's.

    python scripts/soak_server.py --minutes 60 --out /tmp/soak
"""

import argparse
import asyncio
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PORT = 18111
URL_PARAMS = ("/asr/v0.1/stream?content_type=audio/x-raw;format=S16LE;"
              "channels=1;rate=16000")


def make_workdir(work: Path):
    """Tiny char-vocab model + tokenizer + mel stats for the server CLI
    (random weights — the soak measures resources, not WER)."""
    from scripts.real_speech_e2e import CONFIG

    from caiman_asr_tpu.data.tokenizer import (
        save_tokenizer_json, train_tokenizer,
    )

    tok = work / "tok.json"
    save_tokenizer_json(
        tok, train_tokenizer(["the quick brown fox jumps over the dog"] * 8,
                             vocab_size=64),
    )
    cfg = work / "model.yaml"
    cfg.write_text(CONFIG.format(tok=tok))
    stats = work / "mel_stats.npz"
    np.savez(stats, melmeans=np.zeros(80), melvars=np.ones(80))
    return cfg, stats


def proc_stats(pid: int):
    rss_kb = 0
    with open(f"/proc/{pid}/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                rss_kb = int(line.split()[1])
                break
    n_fd = len(os.listdir(f"/proc/{pid}/fd"))
    return rss_kb / 1024.0, n_fd


async def one_client(host: str, port: int, secs: float, rt_factor: float):
    """Stream `secs` of noise at rt_factor x realtime; returns (ok,
    first-response latency, close-to-last-response latency)."""
    import websockets.asyncio.client

    rng = np.random.default_rng(int(time.time() * 1e6) % 2**31)
    audio = (rng.standard_normal(int(16000 * secs)) * 2000).astype(np.int16)
    hop = 960
    t0 = time.perf_counter()
    first = None
    try:
        async with websockets.asyncio.client.connect(
            f"ws://{host}:{port}{URL_PARAMS}",
            subprotocols=["stream.asr.api.myrtle.ai"],
            open_timeout=30, close_timeout=30,
        ) as ws:
            async def send():
                for i in range(0, len(audio), hop):
                    await ws.send(audio[i: i + hop].tobytes())
                    if rt_factor > 0:
                        await asyncio.sleep(0.06 / rt_factor)
                await ws.send(b"")

            sender = asyncio.create_task(send())
            while True:
                try:
                    msg = await asyncio.wait_for(ws.recv(), timeout=60)
                except (asyncio.TimeoutError, Exception):
                    break
                if first is None:
                    first = time.perf_counter() - t0
                data = json.loads(msg)
                if data.get("eos"):
                    break
            await sender
        return True, first, time.perf_counter() - t0
    except Exception:
        return False, first, time.perf_counter() - t0


async def soak_phase(host, port, pid, minutes, out_fh, label):
    end = time.time() + minutes * 60
    window = []
    windows = []
    cycle = 0
    while time.time() < end:
        cycle += 1
        # normal churn: 3 concurrent clients, ~4 s each, 2x realtime
        n, secs, rt = 3, 4.0, 2.0
        if cycle % 7 == 0:
            # flood: 8 concurrent, as fast as the socket allows
            n, secs, rt = 8, 6.0, 0.0
        results = await asyncio.gather(
            *[one_client(host, port, secs, rt) for _ in range(n)]
        )
        ok = sum(1 for r in results if r[0])
        lats = [r[1] for r in results if r[1] is not None]
        window.extend(lats)
        rss, n_fd = proc_stats(pid)
        rec = {
            "t": round(time.time(), 1), "phase": label, "cycle": cycle,
            "ok": ok, "n": n, "rss_mb": round(rss, 1), "fds": n_fd,
            "lat_p50_ms": round(1e3 * float(np.median(lats)), 1) if lats else None,
        }
        out_fh.write(json.dumps(rec) + "\n")
        out_fh.flush()
        if cycle % 10 == 0:
            windows.append((rss, n_fd, float(np.median(window)) if window else 0))
            window = []
            print(f"[{label}] cycle {cycle}: rss={rss:.0f}MB fds={n_fd} "
                  f"p50={windows[-1][2]*1e3:.0f}ms ok={ok}/{n}", flush=True)
    return windows


def run_phase(args, work, decoder, label, minutes, out_fh):
    cfg, stats = make_workdir(work)
    srv_args = [
        "--model_config", str(cfg), "--mel_stats_path", str(stats),
        "--host", "127.0.0.1", "--port", str(PORT),
        "--max_streams", "16", "--decoder", decoder,
        "--sr_segment", "15", "--sr_overlap", "3",
    ]
    if args.cpu:
        # force the server onto CPU in-process (env vars are read too late
        # in this image — jax is preloaded at interpreter startup)
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import sys; sys.path.insert(0, {root!r})\n"
            "from caiman_asr_tpu.serving.server import main\n"
            "main({srv!r})\n"
        ).format(root=str(Path(__file__).parent.parent), srv=srv_args)
        cmd = [sys.executable, "-u", "-c", code]
    else:
        cmd = [sys.executable, "-u", "-m", "caiman_asr_tpu.serving.server"
               ] + srv_args
    env = dict(os.environ)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    # wait for readiness
    t0 = time.time()
    while time.time() - t0 < 600:
        line = proc.stdout.readline()
        if "serving on ws://" in line:
            break
        if proc.poll() is not None:
            raise RuntimeError(f"server died during startup: {line}")
    else:
        proc.kill()
        raise RuntimeError("server never became ready")

    # drain server stdout in a thread so the pipe never blocks it
    import threading

    def drain():
        for _ in proc.stdout:
            pass

    threading.Thread(target=drain, daemon=True).start()
    try:
        windows = asyncio.run(
            soak_phase("127.0.0.1", PORT, proc.pid, minutes, out_fh, label)
        )
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    return windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--rss-slope-mb", type=float, default=30.0,
                    help="max tolerated post-warmup RSS growth per hour")
    ap.add_argument("--cpu", action="store_true",
                    help="run the server on CPU (smoke mode)")
    args = ap.parse_args()

    out_dir = Path(args.out or tempfile.mkdtemp(prefix="soak_"))
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir / "soak.jsonl"
    ok_all = True
    with open(log_path, "w") as fh:
        for decoder, label in (("greedy", "greedy+sr"), ("beam", "beam4+sr")):
            work = out_dir / label
            work.mkdir(exist_ok=True)
            windows = run_phase(args, work, decoder, label,
                                args.minutes / 2.0, fh)
            if len(windows) < 3:
                print(f"[{label}] too few windows ({len(windows)}) — "
                      f"extend --minutes for a meaningful slope")
                continue
            # skip the first window (warmup: compiles, allocator growth)
            rss = [w[0] for w in windows[1:]]
            fds = [w[1] for w in windows[1:]]
            lat = [w[2] for w in windows[1:]]
            hours = (len(rss) - 1) or 1
            # per-window cadence isn't exactly fixed; approximate the slope
            # over the phase duration
            phase_h = args.minutes / 2.0 / 60.0
            slope = (rss[-1] - rss[0]) / max(phase_h, 1e-6)
            lat_ok = lat[-1] <= 3 * max(lat[0], 1e-3)
            fd_ok = fds[-1] <= fds[0] + 8
            # 20 MB absolute floor: short smoke phases would otherwise
            # extrapolate one allocator page into a huge hourly slope
            rss_ok = (rss[-1] - rss[0]) <= max(
                args.rss_slope_mb * phase_h, 20.0
            )
            ok = rss_ok and fd_ok and lat_ok
            ok_all &= ok
            print(f"[{label}] RSS {rss[0]:.0f} -> {rss[-1]:.0f} MB "
                  f"({slope:+.1f} MB/h), fds {fds[0]} -> {fds[-1]}, "
                  f"p50 {lat[0]*1e3:.0f} -> {lat[-1]*1e3:.0f} ms: "
                  f"{'PASS' if ok else 'FAIL'}")
    print(f"soak log: {log_path}")
    print("SOAK:", "PASS" if ok_all else "FAIL")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
