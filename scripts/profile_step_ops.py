"""Capture a jax.profiler trace of the large-196M B=96 train step and rank
XLA ops by total device time (jax.profiler.ProfileData — no TensorBoard UI
needed). Prints the top-N ops and a category rollup (joint kernels, LSTM
kernels, GEMMs, elementwise fusions, copies, optimizer).

Usage: python scripts/profile_step_ops.py [-B 96] [--top 40]
"""

import argparse
import glob
import gzip
import os
import sys
import tempfile
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=96)
    ap.add_argument("-U", type=int, default=40)
    ap.add_argument("--dur", type=float, default=12.0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import init_train_state, make_train_step

    cfg = RNNTModelConfig(
        in_feats=240, enc_n_hid=1536, enc_pre_rnn_layers=2,
        enc_post_rnn_layers=6, enc_stack_time_factor=2,
        pred_n_hid=768, pred_rnn_layers=2, joint_n_hid=1024,
    )
    n_classes = 17408
    model = RNNT(cfg, n_classes)
    blank = n_classes - 1
    B, U = args.B, args.U
    T = int(args.dur * 100 / 3)

    opt = build_optimizer(OptimizerConfig(), model.param_lr_factors())
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, blank_idx=blank,
                           compute_dtype=jnp.bfloat16, donate=True)
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(1, T, B, 240)), jnp.float32),
        "feat_lens": jnp.full((1, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, blank - 1, (1, B, U)), jnp.int32),
        "txt_lens": jnp.full((1, B), U, jnp.int32),
    }
    scalars = {"delay_penalty": jnp.zeros(()), "star_penalty": jnp.zeros(()),
               "grad_noise_std": jnp.zeros(())}
    key = jax.random.PRNGKey(1)

    def run(st, n):
        for _ in range(n):
            st, _m = step(st, batch, key, scalars)
        return st

    state = run(state, 2)
    _fetch(state)

    tracedir = tempfile.mkdtemp(prefix="stepprof_")
    jax.profiler.start_trace(tracedir)
    t0 = time.perf_counter()
    state = run(state, args.iters)
    _fetch(state)
    wall = (time.perf_counter() - t0) / args.iters
    jax.profiler.stop_trace()
    print(f"traced {args.iters} steps, {wall*1e3:.1f} ms/step wall")

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

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/trace meta lines
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e6  # ms
                tot[name] += dur
                cnt[name] += 1
    if not tot:
        # fall back: aggregate everything
        for plane in pd.planes:
            for line in plane.lines:
                for ev in line.events:
                    tot[ev.name] += ev.duration_ns / 1e6
                    cnt[ev.name] += 1

    items = sorted(tot.items(), key=lambda kv: -kv[1])
    n_iter = args.iters
    print(f"\ntop {args.top} ops (ms per step, over {n_iter} steps):")
    for name, ms in items[: args.top]:
        print(f"  {ms/n_iter:9.2f} ms  x{cnt[name]:4d}  {name[:110]}")

    cats = defaultdict(float)
    for name, ms in items:
        ln = name.lower()
        if "pallas" in ln or "custom-call" in ln:
            if "lstm" in ln:
                cats["pallas-lstm"] += ms
            elif "fwd" in ln or "bwd" in ln or "joint" in ln or "fused" in ln:
                cats["pallas-other"] += ms
            else:
                cats["custom-call"] += ms
        elif "dot" in ln or "conv" in ln or "einsum" in ln:
            cats["gemm"] += ms
        elif "fusion" in ln:
            cats["fusion"] += ms
        elif "copy" in ln or "transpose" in ln or "bitcast" in ln:
            cats["copy/transpose"] += ms
        elif "scan" in ln or "while" in ln:
            cats["loop"] += ms
        else:
            cats["other"] += ms
    print("\ncategory rollup (ms per step):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v/n_iter:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
