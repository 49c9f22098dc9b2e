"""Long-run training robustness proof: SIGTERM mid-run, resume, bit-match.

The closest in-environment stand-in for the reference's multi-day 100k-step
training claim (docs/src/training/training_times.md:7): a multi-thousand-
step REAL-SPEECH run on the TPU with RSP active, periodic validation and
best-checkpoint selection, interrupted by SIGTERM mid-run (the cloud-TPU
preemption signal train.py handles) and resumed with ``--resume`` — then
PROVE the recovery is exact by bit-comparing the resumed run's logged
loss/grad-norm at every post-resume step against an uninterrupted control
run of the same seed.

Dataset: the reference's transcribed People's Speech clip mixed with its
real noise recording (TestNoiseDataset) over a grid of SNRs plus speed
perturbs — ~30 real-audio variants (the only genuinely transcribed audio
in this zero-egress environment, augmented with real noise).

Usage:
    python scripts/longrun_robustness.py [--steps 2000] [--interrupt_at 900]
        [--workdir /tmp/longrun_r4]

Prints a PASS/FAIL line plus a JSON summary; leaves both runs' JSONL logs
in the workdir for inspection.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import wave as _wave
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

REF_DATA = Path("/root/reference/training/tests/test_data")


def build_dataset(work: Path) -> tuple[Path, Path, list[str]]:
    """~22 real-audio variants: clip x {SNR grid, speed grid}.

    Same mixing recipe as scripts/real_speech_e2e.py --aug (power-ratio
    SNR scaling, peak clamp to 0.95, resample-based speed perturb) but a
    denser SNR grid with randomized noise offsets — keep the two in sync
    if the mixing math changes."""
    from caiman_asr_tpu.data.audio import read_audio, resample

    manifest = json.load(open(REF_DATA / "peoples-speech-short.json"))
    utt = [u for u in manifest if "repeated" not in u["transcript"]][0]
    clean = read_audio(str(REF_DATA / utt["files"][0]["fname"]), 16000)
    noise = read_audio(
        str(REF_DATA / "TestNoiseDataset" / "data" / "noise_file.wav"), 16000
    )
    p_s = float(np.mean(clean**2))

    def write_wav(name: str, audio: np.ndarray) -> dict:
        path = work / "audio" / name
        path.parent.mkdir(parents=True, exist_ok=True)
        with _wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
            )
        return {
            "transcript": utt["transcript"],
            "files": [{"channels": 1, "sample_rate": 16000.0,
                       "duration": len(audio) / 16000.0,
                       "fname": str(path)}],
            "original_duration": len(audio) / 16000.0,
        }

    rng = np.random.default_rng(7)
    entries = [write_wav("clean.wav", clean)]
    for i, snr in enumerate(range(0, 30, 2)):  # 15 real-noise mixes
        off = int(rng.integers(0, len(noise)))
        n = np.roll(np.tile(noise, int(np.ceil(len(clean) / len(noise))) + 1),
                    off)[: len(clean)]
        p_n = float(np.mean(n**2)) or 1e-12
        scale = np.sqrt(p_s / (p_n * 10.0 ** (snr / 10.0)))
        mixed = clean + scale * n
        peak = np.abs(mixed).max()
        if peak > 1.0:
            mixed = mixed / peak * 0.95
        entries.append(write_wav(f"snr{snr:02d}.wav", mixed))
    for f in (0.85, 0.9, 0.95, 1.05, 1.1, 1.15):  # reference's perturb range
        sped = resample(clean, 16000, int(round(16000 / f)))
        entries.append(write_wav(f"sp{int(f*100):03d}.wav", sped))

    train_m = work / "train.json"
    train_m.write_text(json.dumps(entries))
    val_m = work / "val.json"
    val_m.write_text(json.dumps(entries[:4]))
    return train_m, val_m, [e["transcript"].lower() for e in entries]


def launch(args_list, log_path):
    return subprocess.Popen(
        [sys.executable, "-u", "-m", "caiman_asr_tpu.train"] + args_list,
        cwd=str(ROOT), stdout=open(log_path, "w"), stderr=subprocess.STDOUT,
    )


def read_steps(out_dir: Path) -> dict[int, dict]:
    """step -> train record, merged over every JSONL log in the dir."""
    recs = {}
    for f in sorted(out_dir.glob("log_*.jsonl")):
        for line in open(f):
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("subset") == "train" and "loss" in r:
                recs[r["step"][1]] = r
    return recs


def wait_step(out_dir: Path, target: int, proc, timeout=3600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        recs = read_steps(out_dir)
        if recs and max(recs) >= target:
            return
        if proc.poll() is not None:
            # re-read once: the process may have finished normally
            # between polls after passing the target
            recs = read_steps(out_dir)
            if recs and max(recs) >= target:
                return
            raise RuntimeError(f"train died early rc={proc.returncode}")
        time.sleep(2)
    raise RuntimeError("timed out waiting for training progress")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--interrupt_at", type=int, default=900)
    p.add_argument("--workdir", default="/tmp/longrun_r4")
    p.add_argument("--val_frequency", type=int, default=500)
    args = p.parse_args(argv)

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    train_m, val_m, texts = build_dataset(work)
    print(f"dataset: {len(json.load(open(train_m)))} real-audio variants")

    from caiman_asr_tpu.data.tokenizer import save_tokenizer_json, train_tokenizer
    from scripts.real_speech_e2e import CONFIG

    tok = work / "tok.json"
    save_tokenizer_json(tok, train_tokenizer(texts * 4, vocab_size=64))
    cfg = work / "model.yaml"
    cfg.write_text(CONFIG.format(tok=tok))

    from caiman_asr_tpu.data.generate_mel_stats import main as gen_stats

    stats = work / "mel_stats.npz"
    if not stats.exists():
        gen_stats(["--model_config", str(cfg), "--dataset_dir",
                   str(work), "--manifests", str(train_m),
                   "--output_path", str(stats)])

    def targs(out_dir: Path, resume=False):
        a = [
            "--model_config", str(cfg),
            "--output_dir", str(out_dir),
            "--dataset_dir", str(work),
            "--train_manifests", str(train_m),
            "--val_manifests", str(val_m),
            "--mel_stats_path", str(stats),
            "--norm_starting_ratio", "1.0",
            "--global_batch_size", "8",
            "--val_batch_size", "4",
            "--grad_accumulation_batches", "1",
            "--training_steps", str(args.steps),
            "--val_frequency", str(args.val_frequency),
            "--save_frequency", "250",
            "--log_frequency", "1",
            "--prediction_frequency", str(10 * args.steps),
            "--warmup_steps", "64",
            "--hold_steps", str(args.steps // 3),
            "--half_life_steps", str(args.steps // 8),
            "--lr", "2e-3",
            "--seed", "11",
            "--delay_penalty", "0.01",
            # RSP ON and activated early: concat events must happen
            # INSIDE this run (reference rsp.py activates after
            # warmup+hold+3*half_life by default — far past our horizon)
            "--rsp_seq_len_freq", "95", "0", "5",
            "--rsp_delay", "300",
        ]
        if resume:
            a.append("--resume")
        return a

    # ---- control run: uninterrupted
    out_a = work / "run_a"
    t0 = time.time()
    pa = launch(targs(out_a), work / "run_a.log")
    rc = pa.wait(timeout=7200)
    if rc != 0:
        print(open(work / "run_a.log").read()[-3000:])
        raise SystemExit(f"control run failed rc={rc}")
    dur_a = time.time() - t0
    recs_a = read_steps(out_a)
    print(f"control run: {len(recs_a)} logged steps in {dur_a:.0f}s")

    # ---- interrupted run: SIGTERM mid-run, then --resume
    out_b = work / "run_b"
    pb = launch(targs(out_b), work / "run_b.log")
    wait_step(out_b, args.interrupt_at, pb)
    print(f"sending SIGTERM at >= step {args.interrupt_at}")
    pb.send_signal(signal.SIGTERM)
    rc = pb.wait(timeout=600)
    print(f"interrupted run exited rc={rc}")
    recs_b1 = read_steps(out_b)
    stop_step = max(recs_b1)

    pb2 = launch(targs(out_b, resume=True), work / "run_b_resume.log")
    rc = pb2.wait(timeout=7200)
    if rc != 0:
        print(open(work / "run_b_resume.log").read()[-3000:])
        raise SystemExit(f"resume run failed rc={rc}")
    recs_b = read_steps(out_b)

    # ---- checks
    # 1. bit-exact recovery: every post-resume step's loss & grad_norm
    #    equals the control run's (same seed, deterministic data order)
    post = [s for s in recs_b if s > stop_step]
    if not post:
        print(json.dumps({"interrupted_at": stop_step,
                          "error": "resumed run logged no further steps"}))
        print("LONGRUN ROBUSTNESS: FAIL")
        return 1
    resume_from = min(post)
    mismatches = []
    for s in sorted(recs_b):
        if s < resume_from or s not in recs_a:
            continue
        for k in ("loss", "grad_norm"):
            if recs_b[s].get(k) != recs_a[s].get(k):
                mismatches.append((s, k, recs_b[s].get(k), recs_a[s].get(k)))
    bit_exact = not mismatches
    if mismatches:
        print("first mismatches:", mismatches[:5])

    # 2. training made progress + best ckpt selection worked
    last = max(recs_a)
    early = np.mean([recs_a[s]["loss"] for s in sorted(recs_a)[:50]])
    late = np.mean([recs_a[s]["loss"] for s in sorted(recs_a)[-50:]])
    best_ok = (out_a / "ckpts" / "best.npz").exists()
    covered = last >= args.steps

    # 3. both runs completed the full horizon
    full_b = max(recs_b) >= args.steps

    summary = {
        "steps": last,
        "interrupted_at": stop_step,
        "resumed_from": resume_from,
        "post_resume_steps_compared": sum(
            1 for s in recs_b if s >= resume_from and s in recs_a
        ),
        "bit_exact_resume": bit_exact,
        "loss_first50_mean": round(float(early), 4),
        "loss_last50_mean": round(float(late), 4),
        "best_ckpt": best_ok,
        "control_wall_s": round(dur_a, 1),
    }
    ok = bit_exact and covered and full_b and best_ok and late < early
    print(json.dumps(summary))
    print(f"LONGRUN ROBUSTNESS: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
