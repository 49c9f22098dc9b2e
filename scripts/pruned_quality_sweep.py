"""Dense-vs-pruned quality evidence with repeats (PARITY.md table).

Runs the synthetic tone task (scripts/synthetic_e2e.py data + training)
dense and pruned (S=5) over several seeds, reporting greedy-best and
beam-4 dev WER per run plus per-mode mean/spread — the run-to-run
variance that a single-run comparison cannot show. One process per run
(fresh jit caches, no state bleed); runs are sequential because the rig
has one chip.

    python scripts/pruned_quality_sweep.py --steps 3000 --seeds 1 2 3
"""

import argparse
import re
import subprocess
import sys
from pathlib import Path
from statistics import mean, pstdev

ROOT = Path(__file__).parent.parent


def run_one(mode: str, seed: int, steps: int, lr: float, base: Path,
            task: str = "synthetic") -> dict:
    work = base / f"{mode}_s{seed}"
    if task == "synthetic":
        cmd = [
            sys.executable, str(ROOT / "scripts" / "synthetic_e2e.py"),
            "--workdir", str(work), "--steps", str(steps), "--lr", str(lr),
            "--seed", str(seed),
        ]
    else:  # real / real_aug: People's Speech clip (its own lr)
        cmd = [
            sys.executable, str(ROOT / "scripts" / "real_speech_e2e.py"),
            "--workdir", str(work), "--steps", str(steps),
            "--seed", str(seed),
        ]
        if task == "real_aug":
            # generalization variant: train on clean+noise-mixed+speed
            # conds, dev WER is on HELD-OUT SNRs (see real_speech_e2e
            # --aug) — dense vs pruned compared beyond the overfit proof
            cmd += ["--aug"]
    if mode == "pruned5":
        cmd += ["--pruned", "5"]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(ROOT), timeout=3600
    )
    tail = out.stdout[-2000:] + out.stderr[-2000:]
    if out.returncode != 0 and task == "synthetic":
        raise RuntimeError(f"{mode} seed {seed} failed:\n{tail}")
    if task in ("real", "real_aug"):
        # real_speech_e2e exits non-zero on a failed proof; the sweep
        # records the WER either way
        m = re.search(r"final dev WER after \d+ steps: ([0-9.]+)%",
                      out.stdout)
        if not m:
            raise RuntimeError(f"{mode} seed {seed}: no WER line in\n{tail}")
        streq = "streaming == offline: True" in out.stdout
        row = {
            "mode": mode, "seed": seed,
            "greedy_wer": float(m.group(1)) / 100.0,
            "beam_wer": float("nan"),
            "stream_eq": streq,
        }
        # round-5 aug rows: device fast_beam-4 + ngram fusion (production
        # thresholds) and FPGA-arithmetic quantized greedy
        m2 = re.search(
            r"aug extra rows: beam4\+lm dev WER ([0-9.]+)%, "
            r"quantized greedy dev WER ([0-9.]+)%", out.stdout)
        if m2:
            row["beam_wer"] = float(m2.group(1)) / 100.0
            row["quant_wer"] = float(m2.group(2)) / 100.0
        return row
    m = re.search(
        r"greedy-best dev WER ([0-9.]+)%,\s*beam-4 dev WER ([0-9.]+)%",
        out.stdout,
    )
    if not m:
        raise RuntimeError(f"{mode} seed {seed}: no WER line in\n{tail}")
    return {
        "mode": mode, "seed": seed,
        "greedy_wer": float(m.group(1)) / 100.0,
        "beam_wer": float(m.group(2)) / 100.0,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--base", default="/tmp/pruned_sweep")
    p.add_argument("--task", choices=["synthetic", "real", "real_aug"],
                   default="synthetic")
    args = p.parse_args()

    base = Path(args.base)
    base.mkdir(parents=True, exist_ok=True)
    rows = []
    for mode in ("dense", "pruned5"):
        for seed in args.seeds:
            r = run_one(mode, seed, args.steps, args.lr, base, args.task)
            rows.append(r)
            print(f"{r['mode']:8s} seed {r['seed']}: greedy "
                  f"{r['greedy_wer']:.2%}  beam-4 {r['beam_wer']:.2%}"
                  + (f"  stream==offline {r['stream_eq']}"
                     if "stream_eq" in r else ""),
                  flush=True)

    print("\nmode      n  greedy mean±sd       beam-4 mean±sd       "
          "quantized mean±sd")
    for mode in ("dense", "pruned5"):
        g = [r["greedy_wer"] for r in rows if r["mode"] == mode]
        b = [r["beam_wer"] for r in rows
             if r["mode"] == mode and r["beam_wer"] == r["beam_wer"]]
        q = [r["quant_wer"] for r in rows
             if r["mode"] == mode and "quant_wer" in r]
        beam = (f"{mean(b):.2%} ± {pstdev(b):.2%}" if b
                else "—  (greedy only)")
        quant = (f"{mean(q):.2%} ± {pstdev(q):.2%}" if q else "—")
        print(f"{mode:8s} {len(g)}  {mean(g):.2%} ± {pstdev(g):.2%}   "
              f"{beam}   {quant}")


if __name__ == "__main__":
    main()
