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

    analyze_xplane(pd, args.iters, args.top)


def analyze_xplane(pd, n_iter, top):
    # Per-LINE analysis. An xplane trace is a set of timelines ("lines");
    # summing durations across lines double-counts massively (async
    # slice/copy-start spans cover their whole in-flight window and
    # overlap both each other and the compute ops that hide them). The
    # honest view: per line, the UNION of event intervals = that
    # timeline's busy wall; per-op exclusive attribution only makes
    # sense within one line.

    def union_ms(evs):
        ivs = sorted((ev.start_ns, ev.start_ns + ev.duration_ns)
                     for ev in evs)
        busy, cur_s, cur_e = 0, None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            busy += cur_e - cur_s
        return busy / 1e6

    def categorize(name):
        ln = name.lower()
        if "pallas" in ln or "custom-call" in ln or "tpu_custom_call" in ln:
            if "lstm" in ln:
                return "pallas-lstm"
            if "fwd" in ln or "bwd" in ln or "joint" in ln or "fused" in ln:
                return "pallas-other"
            return "custom-call"
        if ln.startswith("%dot") or "conv" in ln or "einsum" in ln \
                or "transpose_jvp" in ln or ln.startswith("%jvp"):
            return "gemm/jvp"
        if "fusion" in ln:
            return "fusion"
        if "slice-start" in ln or "copy-start" in ln or "-done" in ln:
            return "async-dma"
        if "copy" in ln or "transpose" in ln or "bitcast" in ln:
            return "copy/transpose"
        if "scan" in ln or "while" in ln:
            return "loop"
        return "other"

    lines = []
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            evs = list(line.events)
            if evs:
                lines.append((plane.name, line.name, evs))
    if not lines:
        for plane in pd.planes:
            for line in plane.lines:
                evs = list(line.events)
                if evs:
                    lines.append((plane.name, line.name, evs))

    print("\nper-timeline busy wall (interval union, ms per step):")
    main_line = None
    for pname, lname, evs in sorted(
            lines, key=lambda t: -union_ms(t[2])):
        busy = union_ms(evs)
        print(f"  {busy/n_iter:9.2f} ms  {len(evs):6d} ev  "
              f"{pname[:28]} / {lname[:40]}")
        # the op-level attribution line: the densest non-module timeline
        if main_line is None and len(evs) > 50 and "module" not in lname.lower():
            main_line = (pname, lname, evs)

    if main_line is not None:
        pname, lname, evs = main_line
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for ev in evs:
            tot[ev.name] += ev.duration_ns / 1e6
            cnt[ev.name] += 1
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        print(f"\ntop {top} ops on '{lname}' (ms per step):")
        for name, ms in items[: top]:
            print(f"  {ms/n_iter:9.2f} ms  x{cnt[name]:4d}  {name[:105]}")
        cats = defaultdict(float)
        for name, ms in items:
            cats[categorize(name)] += ms
        print(f"\ncategory rollup on '{lname}' (ms per step):")
        for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {v/n_iter:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
