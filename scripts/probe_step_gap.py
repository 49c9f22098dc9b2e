"""Decompose the unaccounted step time at large-196M B=96.

bench_train.py times enc+pred and joint+loss as SEPARATE jits; the full
step is slower than their sum by ~74 ms. This probe times intermediate
compositions to locate the gap:
  1. grad-only full loss (enc_pred + packed loss, one jit, no optimizer)
  2. grad-only + finish (the real train step)
  3. the finish step alone is known (~15 ms, scripts/probe_finish_step.py)

Usage: python scripts/probe_step_gap.py [-B 96]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=96)
    ap.add_argument("-U", type=int, default=40)
    ap.add_argument("--dur", type=float, default=12.0)
    args = ap.parse_args()

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import init_train_state, make_train_step
    from caiman_asr_tpu.ops.transducer_loss import transducer_loss_from_fg

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
    rng = np.random.default_rng(0)
    mb = {
        "feats": jnp.asarray(rng.normal(size=(T, B, 240)), jnp.float32),
        "feat_lens": jnp.full((B,), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, blank - 1, (B, U)), jnp.int32),
        "txt_lens": jnp.full((B,), U, jnp.int32),
    }
    key = jax.random.PRNGKey(1)

    params_bf = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim > 1 else p,
        state.params)

    # 1. grad-only full loss, bf16 params given (no cast, no optimizer)
    @jax.jit
    def grad_only(params, feats):
        def loss_fn(p):
            (f, f_lens), (g, _), _ = model.enc_pred(
                p, feats, mb["feat_lens"], mb["txt"], mb["txt_lens"],
                train=True, rng=key)
            return transducer_loss_from_fg(
                f, g, p["joint_fc"]["w"], p["joint_fc"]["b"],
                mb["txt"], f_lens, mb["txt_lens"], blank).sum()
        return jax.grad(loss_fn)(params)

    feats_bf = mb["feats"].astype(jnp.bfloat16)
    t = timeit(lambda: grad_only(params_bf, feats_bf))
    print(f"grad-only full loss (bf16 params in): {t*1e3:.1f} ms")

    # 2. grad-only with the f32->bf16 cast inside (as the real step does)
    @jax.jit
    def grad_only_cast(params, feats):
        pbf = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 and p.ndim > 1 else p, params)
        return grad_only.__wrapped__(pbf, feats.astype(jnp.bfloat16))

    t2 = timeit(lambda: grad_only_cast(state.params, mb["feats"]))
    print(f"grad-only + in-graph cast:            {t2*1e3:.1f} ms")

    # 3. the real train step (accum scan A=1 + guard + LAMB + EMA)
    step = make_train_step(model, opt, blank_idx=blank,
                           compute_dtype=jnp.bfloat16, donate=True)
    batch = {k: (v[None] if k != "feats" else v[None]) for k, v in mb.items()}
    scalars = {"delay_penalty": jnp.zeros(()), "star_penalty": jnp.zeros(()),
               "grad_noise_std": jnp.zeros(())}

    def run(st, n):
        for _ in range(n):
            st, _m = step(st, batch, key, scalars)
        return st

    state = run(state, 2)
    _fetch(state)
    iters = 8
    t0 = time.perf_counter()
    state = run(state, iters)
    _fetch(state)
    t3 = (time.perf_counter() - t0) / iters
    print(f"full train step:                      {t3*1e3:.1f} ms")
    print(f"  cast cost     = {max(t2-t, 0)*1e3:.1f} ms")
    print(f"  finish+accum  = {(t3-t2)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
