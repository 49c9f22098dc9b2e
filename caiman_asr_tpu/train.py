"""Training entry point (reference: training/caiman_asr_train/train.py:83-528).

Step-based training loop: host loader feeds audio batches; the device runs
(1) the jitted feature pipeline and (2) the jitted train step (grad-accum
scan + LAMB + EMA + NaN-skip, sharded over the data mesh). Host-side
schedules (LR lives inside the optimizer; delay/star penalties, grad-noise
std, mel-norm ramp) feed traced scalars so nothing recompiles as they move.

Run:  python -m caiman_asr_tpu.train --model_config configs/testing-1023sp.yaml \
        --train_manifests train.json --val_manifests dev.json ...
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.args.train import train_arg_parser
from caiman_asr_tpu.evaluate.core import evaluate
from caiman_asr_tpu.export import Checkpointer
from caiman_asr_tpu.log import init_log
from caiman_asr_tpu.models.config import load_config
from caiman_asr_tpu.parallel import make_mesh, replicated, shard_batch
from caiman_asr_tpu.setup.builders import (
    apply_input_overrides,
    build_data_source_loader,
    build_decoder,
    build_feature_pipelines,
    build_model,
    build_tokenizer,
    load_mel_stats,
    normalize_config_from,
)
from caiman_asr_tpu.training import (
    OptimizerConfig,
    build_optimizer,
    make_train_step,
    make_val_loss_step,
)
from caiman_asr_tpu.training.schedules import (
    ConstantSchedule,
    GradNoiseSchedule,
    MelNormRamp,
    StepSchedule,
)
from caiman_asr_tpu.training.rsp import (
    RSPController,
    is_rsp_on,
    rsp_delay_default,
    zero_rnnt_state,
)
from caiman_asr_tpu.training.step import BATCH_DIMS, init_train_state
from caiman_asr_tpu.training.pack import lattice_nvalid, pack_cap
from caiman_asr_tpu.evaluate.wer import word_error_rate
from caiman_asr_tpu.decoding.response import frame_responses_to_tokens


def stack_microbatches(micro):
    """Stack A microbatch dicts (padding T/U to the group max) into the
    [A, ...] layout the train step scans over."""
    A = len(micro)
    T = max(m["feats"].shape[0] for m in micro)
    U = max(m["txt"].shape[1] for m in micro)
    feats = jnp.stack(
        [jnp.pad(m["feats"], ((0, T - m["feats"].shape[0]), (0, 0), (0, 0))) for m in micro]
    )
    txt = jnp.stack([jnp.pad(m["txt"], ((0, 0), (0, U - m["txt"].shape[1]))) for m in micro])
    return {
        "feats": feats,
        "feat_lens": jnp.stack([m["feat_lens"] for m in micro]),
        "txt": txt,
        "txt_lens": jnp.stack([m["txt_lens"] for m in micro]),
    }


def build_penalty_schedule(args, value_attr="delay_penalty", prefix="dp"):
    """Constant or step/WER-toggled schedule for a loss penalty — the
    value flag accepts a float or the literal "linear_schedule" plus
    {prefix}_initial_value/{prefix}_final_value/{prefix}_toggle_step/
    {prefix}_wer_threshold (reference train_utils/schedule.py semantics,
    shared by the delay penalty and the star penalty)."""
    val = getattr(args, value_attr)
    if val == "linear_schedule":
        return StepSchedule(
            getattr(args, f"{prefix}_initial_value"),
            getattr(args, f"{prefix}_final_value"),
            toggle_step=getattr(args, f"{prefix}_toggle_step"),
            wer_threshold=getattr(args, f"{prefix}_wer_threshold"),
        )
    return ConstantSchedule(float(val or 0.0))


def main(args=None):
    if args is None:
        args = train_arg_parser().parse_args()
    if getattr(args, "multihost", False):
        from caiman_asr_tpu.parallel.mesh import init_multihost

        pid, pcount = init_multihost(
            args.coordinator_address, args.num_hosts, args.host_id
        )
        print(f"multihost: process {pid}/{pcount}")
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    run_ts = getattr(args, "timestamp", None) or str(int(time.time()))
    logger = init_log(
        out_dir,
        enable_tensorboard=args.tensorboard,
        log_file=getattr(args, "log_file", None),
        timestamp=run_ts,
    )
    (out_dir / f"training_args_{run_ts}.json").write_text(
        json.dumps(vars(args), default=str, indent=1)
    )

    from caiman_asr_tpu.args.train import resolve_train_dataset_yaml

    resolve_train_dataset_yaml(args)
    bundle = load_config(args.model_config, args.max_duration)
    cfg = apply_input_overrides(bundle.cfg, args)
    tokenizer = build_tokenizer(cfg, args.tokenizer_model)
    model, blank_idx = build_model(cfg, tokenizer, args)

    opt_cfg = OptimizerConfig(
        lr=args.lr,
        min_lr=args.min_lr,
        weight_decay=args.weight_decay,
        clip_norm=args.clip_norm,
        beta1=args.beta1,
        beta2=args.beta2,
        warmup_steps=args.warmup_steps,
        hold_steps=args.hold_steps,
        half_life_steps=args.half_life_steps,
        ema=args.ema,
    )
    optimizer = build_optimizer(opt_cfg, model.param_lr_factors())
    pruned_range = getattr(args, "pruned_loss_range", 0) or 0
    state = init_train_state(
        model, optimizer, jax.random.PRNGKey(args.seed),
        pruned_loss=pruned_range > 0,
    )

    # ------------------------------------------------------------ resume
    ckptr = Checkpointer(out_dir / "ckpts")
    start_step, epoch, best_wer = 0, 0, float("inf")
    ckpt_path = args.ckpt or (ckptr.last_checkpoint() if args.resume else None)
    if args.resume and ckpt_path is not None:
        p, e, o, meta = ckptr.load_for_resume(
            ckpt_path, state.params, state.ema_params, state.opt_state
        )
        state = state._replace(
            params=p, ema_params=e, opt_state=o,
            step=jnp.asarray(meta.get("step", 0), jnp.int32),
        )
        start_step = int(meta.get("step", 0))
        epoch = int(meta.get("epoch", 0))
        best_wer = float(meta.get("best_wer", float("inf")))
        print(f"Resumed from {ckpt_path} at step {start_step}")
    elif args.fine_tune:
        if ckpt_path is None:
            raise ValueError("--fine_tune requires --ckpt")
        p, _ = ckptr.load_for_fine_tune(
            ckpt_path, state.params, allow_partial=args.allow_partial_checkpoint
        )
        state = state._replace(params=p, ema_params=jax.tree.map(jnp.copy, p))
        print(f"Fine-tuning from {ckpt_path}")

    # -------------------------------------------------------------- data
    mel_stats = load_mel_stats(args.mel_stats_path)
    train_fp, val_fp = build_feature_pipelines(cfg, mel_stats)
    accum = args.grad_accumulation_batches
    micro_bs = max(args.global_batch_size // accum, 1)
    train_loader = build_data_source_loader(
        args, cfg, tokenizer, micro_bs, train=True, seed=args.seed
    )
    noise_snr_sched = None
    if getattr(train_loader, "background_noise", None) is not None or getattr(
        train_loader, "babble_noise", None
    ) is not None:
        from caiman_asr_tpu.data.noise import NoiseSchedule

        noise_snr_sched = NoiseSchedule(
            args.noise_delay_steps,
            args.noise_ramp_steps,
            args.noise_initial_low,
            args.noise_initial_high,
            background=train_loader.background_noise[1]
            if train_loader.background_noise
            else None,
            babble=train_loader.babble_noise,
        )
    val_loader = None
    if args.val_manifests or args.val_tar_files or args.use_hugging_face:
        val_loader = build_data_source_loader(
            args, cfg, tokenizer, args.val_batch_size, train=False
        )

    # ------------------------------------------------------------- steps
    n_dev = len(jax.devices())
    mp = max(int(getattr(args, "model_parallel", 1) or 1), 1)
    if mp > 1:
        # 2-D (data x model) mesh: joint vocab projection sharded over
        # 'model' (parallel/vocab_parallel.py), the rest data-parallel
        import numpy as _np
        from jax.sharding import Mesh as _Mesh, NamedSharding as _NS, PartitionSpec as _P

        from caiman_asr_tpu.training.step import joint_fc_pspecs

        if mp > n_dev:
            raise SystemExit(
                f"--model_parallel {mp} exceeds device count {n_dev}"
            )
        if model.n_classes % mp != 0:
            raise SystemExit(
                f"--model_parallel {mp} must divide n_classes "
                f"{model.n_classes} (equal vocab shards; the canonical "
                "8704/17408-class configs divide by any power of two)"
            )
        n_data = n_dev // mp
        while micro_bs % n_data != 0:  # use fewer data shards if needed
            n_data -= 1
        mesh = _Mesh(
            _np.array(jax.devices()[: n_data * mp]).reshape(n_data, mp),
            ("data", "model"),
        )
        pspecs = joint_fc_pspecs(state.params)
        put_p = lambda t: jax.device_put(
            t, jax.tree.map(lambda s: _NS(mesh, s), pspecs)
        )
        state = state._replace(
            params=put_p(state.params),
            ema_params=put_p(state.ema_params),
            opt_state=jax.device_put(state.opt_state, _NS(mesh, _P())),
            step=jax.device_put(state.step, _NS(mesh, _P())),
        )
    else:
        while micro_bs % n_dev != 0:  # mesh must evenly divide the micro-batch
            n_dev -= 1
        mesh = make_mesh(n_dev)
        state = jax.device_put(state, replicated(mesh))
    from caiman_asr_tpu.utils.user_tokens import get_user_token

    def _tok_idx(name):
        try:
            idx = get_user_token(name, cfg.user_tokens, tokenizer)
        except ValueError as e:
            print(f"WARNING: user token '{name}' disabled: {e}")
            return -1
        return -1 if idx is None else idx

    eos_idx = _tok_idx("eos")
    star_idx = _tok_idx("star")
    rsp_on = is_rsp_on(args.rsp_seq_len_freq)
    if mp > 1:
        if rsp_on:
            raise SystemExit("--model_parallel does not support RSP (DP-only)")
        from caiman_asr_tpu.training.step import make_train_step_tp

        train_step = make_train_step_tp(
            model,
            optimizer,
            mesh,
            blank_idx,
            ema_decay=args.ema,
            eos_idx=eos_idx,
            star_idx=star_idx,
            eos_penalty=args.eos_penalty,
            grad_noise=cfg.grad_noise.noise_level > 0,
            compute_dtype=None if args.no_amp else jnp.bfloat16,
            collect_layer_stats=getattr(args, "log_layer_stats", False),
            pruned_range=pruned_range,
            simple_loss_scale=getattr(args, "simple_loss_scale", 0.5),
        )
    else:
        train_step = make_train_step(
            model,
            optimizer,
            blank_idx,
            ema_decay=args.ema,
            eos_idx=eos_idx,
            star_idx=star_idx,
            eos_penalty=args.eos_penalty,
            grad_noise=cfg.grad_noise.noise_level > 0,
            rsp=rsp_on,
            compute_dtype=None if args.no_amp else jnp.bfloat16,
            collect_layer_stats=getattr(args, "log_layer_stats", False),
            pruned_range=pruned_range,
            simple_loss_scale=getattr(args, "simple_loss_scale", 0.5),
        )
    rsp_ctl, rnnt_state = None, None
    if rsp_on:
        delay = (
            args.rsp_delay
            if args.rsp_delay is not None
            else rsp_delay_default(args.warmup_steps, args.hold_steps, args.half_life_steps)
        )
        rsp_ctl = RSPController(args.rsp_seq_len_freq, delay, seed=args.seed)
        rnnt_state = zero_rnnt_state(model, micro_bs)
        print(f"Random state passing on: delay={delay}, freq={args.rsp_seq_len_freq}")
        if start_step and ckpt_path is not None:
            # bit-exact resume with RSP on: restore the carried RNNT state
            # from the checkpoint (the reference drops it on preemption)
            # and replay the gate stream so the controller's RNG/counter
            # line up with the uninterrupted run
            from caiman_asr_tpu.export.checkpointer import load_extra

            rsp_ctl.fast_forward(start_step, accum)
            ex = load_extra(ckpt_path)
            rsp_leaves = [ex[k] for k in sorted(
                (k for k in ex if k.startswith("rsp/")),
                key=lambda k: int(k.split("/")[1]),
            )]
            if rsp_leaves:
                treedef = jax.tree.structure(rnnt_state)
                if len(rsp_leaves) == treedef.num_leaves:
                    rnnt_state = jax.tree.unflatten(
                        treedef, [jnp.asarray(v) for v in rsp_leaves]
                    )
                    print("Restored carried RSP state from checkpoint")
    def _rsp_extra():
        """Carried RSP state for the checkpoint payload (None when off)."""
        if not rsp_on or rnnt_state is None:
            return None
        return {
            f"rsp/{i}": leaf
            for i, leaf in enumerate(jax.tree.leaves(rnnt_state))
        }

    val_loss_step = make_val_loss_step(model, blank_idx)
    decoder = build_decoder(model, blank_idx, tokenizer, args, cfg, eos_idx=eos_idx)

    dp_sched = build_penalty_schedule(args)
    star_sched = build_penalty_schedule(
        args, value_attr="star_penalty", prefix="star"
    )
    noise_sched = (
        GradNoiseSchedule(
            cfg.grad_noise.noise_level,
            cfg.grad_noise.decay_const,
            cfg.grad_noise.start_step,
        )
        if cfg.grad_noise.noise_level > 0
        else None
    )
    mel_ramp = None
    if mel_stats is not None:
        if getattr(args, "norm_use_global_stats", False):
            # dataset stats from step 0 (no blend ramp) — reference
            # args/mel_feat_norm.py:13; ramp "complete" immediately, so
            # serving-bundle export is not gated
            mel_ramp = MelNormRamp(-1, 0)
        else:
            mel_ramp = MelNormRamp(
                args.norm_ramp_start_step
                if args.norm_ramp_start_step is not None
                else args.warmup_steps,
                args.norm_ramp_end_step
                if args.norm_ramp_end_step is not None
                else args.warmup_steps + args.hold_steps,
                start_ratio=getattr(args, "norm_starting_ratio", 0.0),
            )

    # -------------------------------------------------------------- loop
    from caiman_asr_tpu.log.profiling import PhaseTimers, Profiler, ResourceRecorder

    profiler = Profiler(out_dir, enabled=args.profiler)
    timers = PhaseTimers(out_dir)
    resources = ResourceRecorder(out_dir, enabled=args.profiler)
    profiler.start()
    resources.start()
    rng = jax.random.PRNGKey(args.seed + 7)
    step = start_step
    last_wer = None
    t_log = time.time()
    layer_names = None  # per-layer stat names, built lazily on first log
    audio_secs_since_log = 0.0
    durs_since_log = []  # per-utterance seconds (seq-len stats, ref train.py:371-401)
    utts_since_log = 0
    print(
        f"Training: micro-batch {micro_bs} x accum {accum}, "
        f"{mesh.devices.size} device(s), starting at step {step}"
    )

    resume_batches = 0
    if start_step and hasattr(train_loader, "steps_per_epoch"):
        try:
            spe = max(train_loader.steps_per_epoch(epoch) // accum, 1)
            # derive BOTH the epoch and the position inside it from the
            # step count alone: after start_step completed steps the next
            # batch group is #(start_step % spe) of epoch start_step//spe.
            # The checkpoint's epoch field cannot be trusted here — the
            # preemption epilogue breaks out of the inner loop PAST the
            # epoch increment, so a mid-epoch interrupt stores epoch+1 and
            # replaying from it would skip the interrupted epoch's
            # remaining batches (observed: resumed losses diverged from
            # the uninterrupted control at every post-resume step).
            epoch = start_step // spe
            resume_batches = (start_step % spe) * accum
        except Exception:
            resume_batches = 0
    # Skipped-step alarm (the packed joint poisons overflowed batches to
    # -inf and the NaN guard skips them silently — a SYSTEMATIC overflow
    # would look like training while updating nothing):
    from collections import deque

    skip_hist: deque = deque(maxlen=100)
    skip_warned = False
    # Preemption-safe shutdown: cloud TPU VMs get SIGTERM with ~30 s
    # notice; finish the in-flight step, fall through to the normal
    # epilogue (which saves the `last` checkpoint), and `--resume` picks
    # up mid-epoch from the saved step. SIGINT gets the same grace.
    preempted = {"flag": False}
    import signal as _signal

    def _on_term(signum, frame):
        if preempted["flag"]:  # second signal: give up immediately
            raise KeyboardInterrupt
        preempted["flag"] = True
        print(f"signal {signum}: finishing the current step, then saving "
              "the last checkpoint and exiting (resume with --resume)")

    prev_handlers = {}
    for sig in (_signal.SIGTERM, _signal.SIGINT):
        try:
            prev_handlers[sig] = _signal.signal(sig, _on_term)
        except ValueError:  # non-main thread (tests drive main() directly)
            pass
    while step < args.training_steps and not preempted["flag"]:
        micro_group = []
        micro_nvalid = []
        batch_iter = iter(train_loader.epoch(epoch, resume_step=resume_batches))
        resume_batches = 0  # only the first resumed epoch is partial
        while True:
            with timers.phase("dataloading"):
                batch = next(batch_iter, None)
            if batch is None:
                break
            if noise_snr_sched is not None:
                noise_snr_sched.adjust_snrs(step)
            ratio = mel_ramp.ratio(step) if mel_ramp else 0.0
            # keys are DERIVED (fold_in on step x microbatch position), not
            # chained: a --resume at step s reproduces the exact key stream
            # (dither/SpecAugment/dropout) of an uninterrupted run, making
            # recovery bit-exact — a sequential split chain would restart
            # from the seed and diverge
            k1 = jax.random.fold_in(
                rng, step * (accum + 1) + len(micro_group)
            )
            with timers.phase("feat_proc"):
                feats, feat_lens = train_fp(
                    batch.audio, batch.audio_lens, k1, dataset_to_utt_ratio=ratio
                )
            micro_group.append(
                {
                    "feats": feats,
                    "feat_lens": feat_lens,
                    "txt": jnp.asarray(batch.tokens),
                    "txt_lens": jnp.asarray(batch.token_lens),
                }
            )
            micro_nvalid.append(
                lattice_nvalid(
                    batch.audio_lens, batch.token_lens, cfg.input_train, model.cfg
                )
            )
            audio_secs_since_log += float(np.sum(batch.audio_lens)) / train_loader.sr
            durs_since_log.extend(
                (np.asarray(batch.audio_lens) / train_loader.sr).tolist()
            )
            utts_since_log += len(batch.audio_lens)
            if len(micro_group) < accum:
                continue

            stacked = stack_microbatches(micro_group)
            pack_to = None
            # the pruned loss bounds compute via the band; packing's static
            # cap would only add compile churn on top
            if pruned_range == 0 and not getattr(args, "no_lattice_packing", False):
                enc_t = -(
                    -stacked["feats"].shape[1] // model.cfg.enc_stack_time_factor
                )
                dense_n = (
                    stacked["feats"].shape[2] * enc_t * (stacked["txt"].shape[2] + 1)
                )
                if jax.process_count() > 1:
                    # Under GSPMD the packed joint gathers over the GLOBAL
                    # batch: the valid count of one microbatch is the SUM of
                    # the hosts' local counts, and pack_to is a STATIC jit
                    # arg all hosts must agree on (different caps compile
                    # different executables for one SPMD step = collective
                    # mismatch). Allgather per-microbatch local counts +
                    # local dense sizes, sum across hosts elementwise, cap
                    # at the worst microbatch.
                    from jax.experimental import multihost_utils

                    local = np.asarray(micro_nvalid + [dense_n], np.int64)
                    gathered = np.asarray(
                        multihost_utils.process_allgather(local)
                    )  # [n_hosts, accum + 1]
                    summed = np.sum(gathered, axis=0)
                    nv = int(np.max(summed[:-1]))
                    dense_n = int(summed[-1])
                else:
                    nv = max(micro_nvalid)
                pack_to = pack_cap(nv, dense_n)
            if jax.process_count() > 1:
                from caiman_asr_tpu.parallel.mesh import shard_batch_multihost

                device_batch = shard_batch_multihost(mesh, stacked, BATCH_DIMS)
            else:
                device_batch = shard_batch(mesh, stacked, BATCH_DIMS)
            micro_group = []
            micro_nvalid = []
            scalars = {
                "delay_penalty": jnp.asarray(
                    dp_sched.step(step, hints={"wer": last_wer}), jnp.float32
                ),
                "star_penalty": jnp.asarray(
                    star_sched.step(step, hints={"wer": last_wer}), jnp.float32
                ),
                "grad_noise_std": jnp.asarray(
                    noise_sched.std(step) if noise_sched else 0.0, jnp.float32
                ),
            }
            k2 = jax.random.fold_in(rng, step * (accum + 1) + accum)
            with timers.phase("fwd_bwd"):
                if rsp_on:
                    gates = rsp_ctl.gates(step, accum)
                    state, metrics, rnnt_state = train_step(
                        state, device_batch, k2, scalars, rnnt_state, gates,
                        pack_to=pack_to,
                    )
                    if bool(metrics["skipped"]):
                        rsp_ctl.reset()
                else:
                    state, metrics = train_step(
                        state, device_batch, k2, scalars, pack_to=pack_to
                    )
            step += 1
            if args.profiler and step % args.timings_frequency == 0:
                timers.dump(step)

            # Device scalar — NOT fetched here: an int() per step would
            # block the host on every step (a full tunnel RTT on remote
            # TPUs) and kill host/device overlap. The alarm below samples
            # it only at log_frequency boundaries with ONE batched fetch.
            skip_hist.append(metrics["skipped"])
            if step % args.log_frequency == 0 and len(skip_hist) >= 50:
                skips = np.asarray(jnp.stack(list(skip_hist)))
                rate = float(skips.mean())
                if rate >= 0.5 and not skip_warned:
                    logger.log(
                        (epoch, step),
                        {"skipped_rate_alert": rate},
                        subset="train",
                    )
                    print(
                        f"WARNING: {rate:.0%} of the last {len(skip_hist)} "
                        "steps were skipped (non-finite loss). Systematic "
                        "joint-logit overflow or data corruption — training "
                        "is NOT updating.",
                        flush=True,
                    )
                    skip_warned = True
                elif rate < 0.25:
                    skip_warned = False
                if len(skip_hist) == skip_hist.maxlen and rate == 1.0:
                    raise RuntimeError(
                        f"every one of the last {skip_hist.maxlen} steps was "
                        "skipped (non-finite loss) — aborting a stalled run"
                    )

            logger.accumulate(
                {
                    "loss": metrics["loss"],
                    "grad_norm": metrics["grad_norm"],
                    "skipped": metrics["skipped"],
                }
            )
            if step % args.log_frequency == 0:
                dt = time.time() - t_log
                tput = {
                    "audio_s_per_s": audio_secs_since_log / dt,
                    "utts_per_s": utts_since_log / dt,
                }
                if durs_since_log:
                    d = np.asarray(durs_since_log)
                    tput.update(
                        seq_len_mean_s=float(d.mean()),
                        seq_len_max_s=float(d.max()),
                    )
                    if getattr(args, "log_verbose_utterance_statistics", False):
                        # reference args/train.py:402: expensive percentile
                        # stats over the window's utterance durations
                        tput.update(
                            seq_len_min_s=float(d.min()),
                            seq_len_p50_s=float(np.percentile(d, 50)),
                            seq_len_p90_s=float(np.percentile(d, 90)),
                            seq_len_p99_s=float(np.percentile(d, 99)),
                            seq_len_std_s=float(d.std()),
                        )
                logger.accumulate(tput)
                logger.flush_accumulated((epoch, step))
                if "layer_stats" in metrics:
                    from caiman_asr_tpu.log.layer_stats import (
                        layer_stat_names, layer_stats_dict,
                    )

                    if layer_names is None:
                        layer_names = layer_stat_names(state.params)
                    logger.log(
                        (epoch, step),
                        layer_stats_dict(layer_names, metrics["layer_stats"]),
                        subset="train_layers",
                    )
                t_log, audio_secs_since_log, utts_since_log = time.time(), 0.0, 0
                durs_since_log = []

            if step % args.prediction_frequency == 0:
                _log_train_sample(
                    logger, decoder, state.params, batch, train_fp, tokenizer,
                    normalize_config_from(cfg.input_train), epoch, step,
                )

            if val_loader is not None and step % args.val_frequency == 0:
                result = evaluate(
                    state.ema_params,
                    decoder,
                    val_loader,
                    val_fp,
                    tokenizer,
                    val_loss_fn=None if args.skip_val_loss else val_loss_step,
                    standardize_wer=cfg.input_val.dataset.standardize_wer,
                    normalize_config=normalize_config_from(cfg.input_val),
                    charset=list(cfg.tokenizer.labels),
                    dump_preds_dir=(out_dir / "preds") if args.dump_preds else None,
                    epoch=epoch,
                    step=step,
                    subset="dev_ema",
                    logger=logger,
                )
                last_wer = result.wer
                if args.die_if_wer_bad and step >= 10000 and result.wer > 0.99:
                    raise RuntimeError(f"dev WER {result.wer:.2%} at step {step}")
                if result.wer < best_wer:
                    best_wer = result.wer
                    best_path = ckptr.save(
                        state.params, state.ema_params, state.opt_state,
                        epoch, step, best_wer, is_best=True,
                        meta=_ckpt_meta(cfg, mel_ramp, step),
                        extra=_rsp_extra(),
                    )
                    _maybe_export_serving_bundle(best_path, args, out_dir)

            if step % args.save_frequency == 0:
                ckptr.save(
                    state.params, state.ema_params, state.opt_state,
                    epoch, step, best_wer,
                    meta=_ckpt_meta(cfg, mel_ramp, step),
                    extra=_rsp_extra(),
                )
            if step >= args.training_steps or preempted["flag"]:
                break
        epoch += 1

    for sig, h in prev_handlers.items():
        _signal.signal(sig, h)
    if preempted["flag"]:
        print(f"preempted at step {step}; saving last checkpoint")
    if not getattr(args, "dont_save_at_the_end", False):
        ckptr.save(
            state.params, state.ema_params, state.opt_state,
            epoch, step, best_wer, is_last=True,
            meta=_ckpt_meta(cfg, mel_ramp, step),
            extra=_rsp_extra(),
        )
    profiler.stop()
    resources.stop()
    timers.dump(step)
    print(f"Training done at step {step}; best dev WER {best_wer:.2%}")
    logger.close()
    return state, best_wer


def _maybe_export_serving_bundle(ckpt_path, args, out_dir):
    """Auto-export the serving bundle for best checkpoints when the gates
    pass (reference export/checkpointer.py:106-140)."""
    from caiman_asr_tpu.export.serving_bundle import create_serving_bundle

    try:
        out = create_serving_bundle(
            ckpt_path,
            args.model_config,
            Path(out_dir) / "serving_bundle.npz",
            mel_stats_path=args.mel_stats_path,
            skip_state_dict_check=args.skip_state_dict_check,
        )
        print(f"exported serving bundle {out}")
    except Exception as e:  # gates: incomplete ramp / unsupported schema
        print(f"serving bundle not exported: {e}")


def _ckpt_meta(cfg, mel_ramp, step):
    return {
        "tokenizer_kw": {
            "labels": list(cfg.tokenizer.labels),
            "sampling": cfg.tokenizer.sampling,
        },
        "logmel_norm_weight": mel_ramp.ratio(step) if mel_ramp else 0.0,
    }


def _log_train_sample(
    logger, decoder, params, batch, fp, tokenizer, norm_cfg, epoch, step
):
    """Greedy-decode the current train batch and log its WER
    (reference train.py:313-332)."""
    feats, feat_lens = fp(batch.audio, batch.audio_lens)
    responses = decoder.decode(params, feats, feat_lens)
    hyps = [
        tokenizer.detokenize(frame_responses_to_tokens(r)) for r in responses
    ]
    refs = [
        normalize_transcript_cached(t, tokenizer.charset, norm_cfg)
        for t in batch.transcripts
    ]
    res = word_error_rate(hyps, refs, standardize=True)
    logger.log((epoch, step), {"train_wer": res.wer * 100.0}, subset="train")


def normalize_transcript_cached(t, charset, cfg):
    from caiman_asr_tpu.data.text.normalize import normalize_transcript

    return normalize_transcript(t, charset, cfg)


if __name__ == "__main__":
    main()
