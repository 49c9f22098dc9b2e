"""Live user-perceived-latency (UPL) probe through the real server.

The reference reports median UPL as a product metric (docs/src/
performance.md:23, measured via latency/client.py response timestamps).
This script reproduces that methodology end to end on a trained model:

1. forced-align the ground-truth transcript with the served model
   (latency/generate_gt_ctm.py) to get per-word END times in the audio;
2. launch serving/server.py on the checkpoint;
3. stream the utterance's raw int16 audio in REAL TIME (60 ms chunks
   fired on the wall clock), recording each response's arrival;
4. fuse partials/finals into per-word first-continuously-visible times
   (latency/client.get_word_timestamps — a word only counts from the
   oldest partial whose prefix survived uninterrupted into a final);
5. UPL(word) = first-visible wall time − ground-truth word end time,
   over difflib-aligned correctly-recognised words.

Usage (on a scripts/real_speech_e2e.py workdir):
    python scripts/measure_upl.py --workdir /tmp/rse_sweep/dense_s1 \
        [--port 8901] [--decoder greedy] [--runs 3]

Prints per-run word UPLs and a final JSON line with
median/mean/p90 UPL seconds.
"""

from __future__ import annotations

import argparse
import asyncio
import difflib
import json
import socket
import subprocess
import sys
import time
from pathlib import Path
from statistics import mean, median

import numpy as np

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

CHUNK_SECONDS = 0.060
RATE = 16000


def _wait_port(port: int, proc, timeout: float = 600.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"server died (rc={proc.returncode})")
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1.0):
                return
        except OSError:
            time.sleep(0.5)
    raise RuntimeError("server did not open its port in time")


async def _stream_once(uri: str, audio_i16: np.ndarray):
    """Send audio paced on the wall clock; return (responses, t0).

    responses: list of latency.client.ServerResponse with arrival stamps
    relative to the first chunk's send time.
    """
    import websockets.asyncio.client

    from caiman_asr_tpu.inference.transcriber import QUERY, SUBPROTOCOL
    from caiman_asr_tpu.latency.client import ServerResponse

    hop = int(RATE * CHUNK_SECONDS)
    n_chunks = -(-len(audio_i16) // hop)
    responses = []
    async with websockets.asyncio.client.connect(
        f"{uri}?{QUERY}", subprotocols=[SUBPROTOCOL], max_size=None
    ) as ws:
        t0 = time.perf_counter()

        async def send():
            for i in range(n_chunks):
                target = t0 + i * CHUNK_SECONDS
                delay = target - time.perf_counter()
                if delay > 0:
                    await asyncio.sleep(delay)
                await ws.send(audio_i16[i * hop : (i + 1) * hop].tobytes())
            await ws.send(b"")  # EOS

        send_task = asyncio.create_task(send())
        try:
            async for message in ws:
                at = time.perf_counter() - t0
                r = json.loads(message)
                if r.get("alternatives"):
                    responses.append(ServerResponse(
                        text=r["alternatives"][0]["transcript"],
                        timestamp=at,
                        is_partial=bool(r.get("is_provisional", False)),
                    ))
                if r.get("eos"):
                    break
        finally:
            send_task.cancel()
    return responses


def _align_upl(word_times, gt_words):
    """difflib-align hyp words to ground-truth (word, end_time) pairs;
    UPL = visible_time − gt_end for equal-matched words (the reference
    scores correctly-recognised words, measure_latency.py:163-295)."""
    hyp = [w for w, _ in word_times]
    ref = [w for w, _ in gt_words]
    sm = difflib.SequenceMatcher(a=ref, b=hyp, autojunk=False)
    upls = []
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag != "equal":
            continue
        for k in range(i2 - i1):
            gt_end = gt_words[i1 + k][1]
            seen = word_times[j1 + k][1]
            upls.append((hyp[j1 + k], seen - gt_end))
    return upls


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="a scripts/real_speech_e2e.py workdir (model.yaml, "
                        "tok.json, mel_stats.npz, out/ckpts/last.npz, "
                        "manifest.json)")
    p.add_argument("--port", type=int, default=8901)
    p.add_argument("--decoder", default="greedy",
                   choices=["greedy", "beam"])
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--gt_ctm", default=None,
                   help="reuse an existing forced-alignment CTM")
    p.add_argument("--server_args", default="",
                   help="extra flags forwarded to serving.server, one "
                        "shell-quoted string (e.g. "
                        "'--beam_final_emission_thresh 0.9')")
    p.add_argument("--manifest", default=None,
                   help="manifest path (default <workdir>/manifest.json); "
                        "relative audio fnames resolve under --dataset_dir")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint (default <workdir>/out/ckpts/last.npz)")
    p.add_argument("--dataset_dir", default="/",
                   help="base dir for relative manifest fnames")
    p.add_argument("--utt_index", type=int, default=0,
                   help="which manifest utterance to stream")
    args = p.parse_args(argv)

    work = Path(args.workdir)
    cfg = work / "model.yaml"
    ckpt = Path(args.ckpt) if args.ckpt else work / "out" / "ckpts" / "last.npz"
    tok = work / "tok.json"
    stats = work / "mel_stats.npz"
    manifest_path = Path(args.manifest) if args.manifest else (
        work / "manifest.json"
    )
    manifest = json.load(open(manifest_path))
    utt = manifest[args.utt_index]
    audio_path = str(Path(args.dataset_dir) / utt["files"][0]["fname"])

    # 1. ground-truth word end times by RNN-T forced alignment (its own
    # process: the chip is exclusive, the server needs it next)
    gt_ctm = Path(args.gt_ctm) if args.gt_ctm else (
        work / f"gt_{args.utt_index}.ctm"
    )
    if not gt_ctm.exists():
        print("forced-aligning ground truth ...", flush=True)
        one = work / f"upl_utt_{args.utt_index}.json"
        one.write_text(json.dumps([utt]))
        subprocess.run([
            sys.executable, "-m", "caiman_asr_tpu.latency.generate_gt_ctm",
            "--model_config", str(cfg), "--ckpt", str(ckpt),
            "--tokenizer_model", str(tok), "--mel_stats_path", str(stats),
            "--dataset_dir", str(args.dataset_dir),
            "--manifests", str(one),
            "--output_ctm", str(gt_ctm),
        ], cwd=str(ROOT), check=True, timeout=900)
    from caiman_asr_tpu.latency.client import get_word_timestamps
    from caiman_asr_tpu.latency.ctm import load_ctm

    gt_words = [(c.word, c.end_time) for c in load_ctm(str(gt_ctm))]
    print(f"ground truth: {len(gt_words)} words, "
          f"last ends {gt_words[-1][1]:.2f}s")

    # 2. the server, on its own chip process
    srv_cmd = [
        sys.executable, "-u", "-m", "caiman_asr_tpu.serving.server",
        "--model_config", str(cfg), "--ckpt", str(ckpt),
        "--tokenizer_model", str(tok), "--mel_stats_path", str(stats),
        "--port", str(args.port), "--max_streams", "4",
        "--decoder", args.decoder,
    ] + __import__("shlex").split(args.server_args)
    srv = subprocess.Popen(srv_cmd, cwd=str(ROOT),
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    try:
        _wait_port(args.port, srv)
        time.sleep(2.0)  # engine warmup finishes after the port opens

        from caiman_asr_tpu.data.audio import read_audio

        audio = read_audio(audio_path, RATE)
        audio_i16 = np.clip(
            np.asarray(audio, np.float32) * 32768.0, -32768, 32767
        ).astype(np.int16)
        uri = f"ws://127.0.0.1:{args.port}/asr/v0.1/stream"

        all_upls = []
        all_fin_upls = []
        for run in range(args.runs):
            responses = asyncio.run(_stream_once(uri, audio_i16))
            words = get_word_timestamps(responses)
            upls = _align_upl(words, gt_words)
            all_upls.append(upls)
            # finals-only visibility: a word counts only when a FINAL
            # carries it (clients that ignore provisionals; the surface
            # --beam_final_emission_thresh bounds). get_word_timestamps
            # handles words split across two finals (each character keeps
            # its own arrival time; the word completes at the latest one).
            fin_words = get_word_timestamps(
                [r for r in responses if not r.is_partial]
            )
            all_fin_upls.append(_align_upl(fin_words, gt_words))
            hyp_text = " ".join(w for w, _ in words)
            print(f"run {run}: {len(responses)} responses, "
                  f"{len(upls)}/{len(gt_words)} words matched")
            print(f"  hyp: {hyp_text[:100]}")
            print("  word UPLs (s):",
                  " ".join(f"{w}:{u:.2f}" for w, u in upls[:12]))
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=20)
        except subprocess.TimeoutExpired:
            srv.kill()

    flat = [u for upls in all_upls for _, u in upls]
    if not flat:
        print(json.dumps({"error": "no matched words"}))
        return 1
    flat.sort()
    out = {
        "median_upl_s": round(median(flat), 4),
        "mean_upl_s": round(mean(flat), 4),
        "p90_upl_s": round(flat[min(int(0.9 * len(flat)), len(flat) - 1)], 4),
        "n_words": len(flat),
        "runs": args.runs,
        "decoder": args.decoder,
    }
    fin_flat = sorted(u for upls in all_fin_upls for _, u in upls)
    if fin_flat:
        out["finals_median_upl_s"] = round(median(fin_flat), 4)
        out["finals_p90_upl_s"] = round(
            fin_flat[min(int(0.9 * len(fin_flat)), len(fin_flat) - 1)], 4
        )
        out["finals_max_upl_s"] = round(fin_flat[-1], 4)
        out["finals_n_words"] = len(fin_flat)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
