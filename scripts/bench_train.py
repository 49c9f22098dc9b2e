"""Training-step microbenchmark + component breakdown for base-85M / large-196M.

Times (on the attached chip):
  - full jitted train step (grad-accum A microbatches of B utts x DUR s)
  - encoder+pred forward/backward alone
  - fused joint+loss forward/backward alone

Reports audio-s/s per chip. Reference baseline: 2,900 audio-s/s per A100
(8xA100 = 23,200 aggregate, docs/src/training/training_times.md:7).

Timing methodology (remote-TPU safe): ``jax.block_until_ready`` does not
reliably wait on the tunneled "axon" platform, so each measurement syncs via
a host fetch, dispatches N iterations, then fetches one scalar from the LAST
iteration's output. The device executes serially, so
(fetch_end - t0) / N bounds the per-iteration device time (plus one RTT/N).

Usage: python scripts/bench_train.py [--large] [-B 32] [-A 1] [--dur 12] [-U 40]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _fetch(out):
    """Pull one element of one leaf to the host (forces completion)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(fn, *args, warmup=2, iters=10):
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
    ap.add_argument("--large", action="store_true")
    ap.add_argument("-B", type=int, default=32)
    ap.add_argument("-A", type=int, default=1)
    ap.add_argument("--dur", type=float, default=12.0)
    ap.add_argument("-U", type=int, default=40)
    ap.add_argument("--step-only", action="store_true")
    ap.add_argument(
        "--ragged", action="store_true",
        help="bucketed-real-batch proxy: per-utterance lengths sampled as "
             "durations ~ U[0.85, 1.0]*dur and tokens ~ U[0.6, 1.0]*U "
             "(what a duration-bucketed sampler delivers), run through the "
             "packed-lattice loss (pack_to) exactly as train.py does; "
             "audio-s/s counts VALID seconds only — the apples-to-apples "
             "number vs the reference's ragged-real-data baselines")
    ap.add_argument(
        "--pruned", type=int, default=0, metavar="S",
        help="use the two-stage pruned loss with band width S "
             "(--pruned_loss_range S in train.py); 0 = exact dense loss")
    ap.add_argument(
        "--no-donate", dest="donate", action="store_false",
        help="disable train-state donation (doubles state HBM — the "
             "pre-r2 bench behavior, for comparison only)")
    ap.add_argument("--profile", type=str, default=None, help="trace dir")
    args = ap.parse_args()

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.ops.transducer_loss import transducer_loss_from_fg
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import init_train_state, make_train_step

    if args.large:
        cfg = RNNTModelConfig(
            in_feats=240, enc_n_hid=1536, enc_pre_rnn_layers=2,
            enc_post_rnn_layers=6, enc_stack_time_factor=2,
            pred_n_hid=768, pred_rnn_layers=2, joint_n_hid=1024,
        )
        n_classes = 17408
    else:
        cfg = RNNTModelConfig(
            in_feats=240, enc_n_hid=1024, enc_pre_rnn_layers=2,
            enc_post_rnn_layers=6, enc_stack_time_factor=2,
            pred_n_hid=512, pred_rnn_layers=2, joint_n_hid=768,
        )
        n_classes = 8704
    model = RNNT(cfg, n_classes)
    blank = n_classes - 1

    A, B, U = args.A, args.B, args.U
    T = int(args.dur * 100 / 3)  # 10ms hop, stack 3
    audio_s = A * B * args.dur

    opt = build_optimizer(OptimizerConfig(), model.param_lr_factors())
    state = init_train_state(model, opt, jax.random.PRNGKey(0),
                             pruned_loss=args.pruned > 0)
    # donate=True matches real training (train.py) AND its HBM footprint —
    # without donation the train state (params+grads+LAMB m/v+EMA) is
    # double-buffered, ~3 GB of phantom pressure at large-196M that
    # previously made stored-u look unfittable
    step = make_train_step(model, opt, blank_idx=blank, compute_dtype=jnp.bfloat16,
                           donate=args.donate, pruned_range=args.pruned)

    rng = np.random.default_rng(0)
    pack_to = None
    if args.ragged:
        # bucketed-batch raggedness: durations tight (the bucketing sampler
        # groups similar lengths), token counts looser
        feat_lens_np = rng.integers(int(0.85 * T), T + 1, (A, B))
        txt_lens_np = rng.integers(int(0.6 * U), U + 1, (A, B))
        audio_s = float(feat_lens_np.sum()) * (args.dur / T)
    else:
        feat_lens_np = np.full((A, B), T)
        txt_lens_np = np.full((A, B), U)
    batch = {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 240)), jnp.float32),
        "feat_lens": jnp.asarray(feat_lens_np, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, blank - 1, (A, B, U)), jnp.int32),
        "txt_lens": jnp.asarray(txt_lens_np, jnp.int32),
    }
    if args.ragged:
        from caiman_asr_tpu.training.pack import pack_cap

        stf = cfg.enc_stack_time_factor
        enc_lens = -(-feat_lens_np // stf)
        nv = int(max(np.sum(enc_lens[a] * (txt_lens_np[a] + 1))
                     for a in range(A)))
        enc_t = -(-T // stf)
        dense_n = B * enc_t * (U + 1)
        pack_to = pack_cap(nv, dense_n)
        print(f"ragged: valid lattice {nv}/{dense_n} "
              f"({nv/dense_n:.0%}), pack_to={pack_to}, "
              f"valid audio {audio_s:.0f} s/step")
    scalars = {
        "delay_penalty": jnp.zeros(()),
        "star_penalty": jnp.zeros(()),
        "grad_noise_std": jnp.zeros(()),
    }
    key = jax.random.PRNGKey(1)

    # chain the state through iterations (forces serial execution on device);
    # rebinding also keeps donation valid — each call consumes the previous
    # state buffers
    def run_steps(st, n):
        for _ in range(n):
            st, _m = step(st, batch, key, scalars, pack_to=pack_to)
        return st

    state = run_steps(state, 2)  # compile + settle
    _fetch(state)
    iters = 10
    t0 = time.perf_counter()
    state = run_steps(state, iters)
    _fetch(state)
    t_step = (time.perf_counter() - t0) / iters
    print(f"full step: {t_step*1e3:.1f} ms  -> {audio_s/t_step:.0f} audio-s/s/chip")
    if args.step_only:
        return

    # ---- component breakdown (single microbatch, same shapes) ----
    params_bf = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim > 1 else p,
        state.params)
    mb = {k: v[0] for k, v in batch.items()}
    feats_bf = mb["feats"].astype(jnp.bfloat16)

    @jax.jit
    def encpred_fwdbwd(params, feats):
        def loss_fn(p):
            (f, f_lens), (g, _), _ = model.enc_pred(
                p, feats, mb["feat_lens"], mb["txt"], mb["txt_lens"],
                train=True, rng=key)
            return (f.astype(jnp.float32).sum() + g.astype(jnp.float32).sum())
        return jax.grad(loss_fn)(params)

    t_enc = timeit(lambda: encpred_fwdbwd(params_bf, feats_bf))
    print(f"enc+pred fwd+bwd: {t_enc*1e3:.1f} ms")

    @jax.jit
    def encpred_fwd(params, feats):
        (f, f_lens), (g, _), _ = model.enc_pred(
            params, feats, mb["feat_lens"], mb["txt"], mb["txt_lens"],
            train=True, rng=key)
        return f, f_lens, g

    f, f_lens, g = encpred_fwd(params_bf, feats_bf)
    _fetch(f)
    t_encf = timeit(lambda: encpred_fwd(params_bf, feats_bf))
    print(f"enc+pred fwd only: {t_encf*1e3:.1f} ms")

    @jax.jit
    def loss_fwdbwd(f, g, w, b):
        def loss_fn(f, g, w, b):
            return transducer_loss_from_fg(
                f, g, w, b, mb["txt"], f_lens, mb["txt_lens"], blank).sum()
        return jax.grad(loss_fn, argnums=(0, 1, 2, 3))(f, g, w, b)

    w, b = params_bf["joint_fc"]["w"], params_bf["joint_fc"]["b"]
    t_loss = timeit(lambda: loss_fwdbwd(f, g, w, b))
    print(f"joint+loss fwd+bwd: {t_loss*1e3:.1f} ms")

    @jax.jit
    def loss_fwd(f, g, w, b):
        return transducer_loss_from_fg(
            f, g, w, b, mb["txt"], f_lens, mb["txt_lens"], blank).sum()

    t_lossf = timeit(lambda: loss_fwd(f, g, w, b))
    print(f"joint+loss fwd only: {t_lossf*1e3:.1f} ms")

    print(f"unaccounted (step - enc_bwd - loss_bwd): "
          f"{(t_step - A*(t_enc + t_loss))*1e3:.1f} ms")

    if args.profile:
        with jax.profiler.trace(args.profile):
            state = run_steps(state, 3)
            _fetch(state)
        print("trace written to", args.profile)


if __name__ == "__main__":
    main()
