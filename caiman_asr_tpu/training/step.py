"""Jitted training / validation step functions.

TPU-native replacement for the reference's train-step machinery
(train_utils/core.py:20-91, rnnt/model_forward.py:20-103,
train_utils/batch_splitting.py:54-144):

- **One jit-compiled function per optimizer step.** Gradient accumulation is
  a ``lax.scan`` over microbatches inside the step (reference: Python loop,
  train.py:212-290), so weights update once per step and XLA overlaps the
  accumulation loop.
- **Data parallelism for free**: the caller shards each microbatch over the
  mesh's ``data`` axis; the loss-sum reduction makes XLA insert the gradient
  all-reduce over ICI. No DDP wrapper, no NCCL plumbing.
- **NaN robustness**: the reference all_gathers a NaN flag and skips the
  batch on any rank (train_utils/core.py:20-41, train.py:274-288). Here the
  total loss is global already, so a single ``isfinite`` check guards the
  update; a skipped step leaves params/opt-state/EMA/step untouched.
- **No batch splitting / no AMP GradScaler**: the fused chunked loss
  (ops/transducer_loss.py:transducer_loss_from_fg) bounds joint memory, and
  bf16-on-TPU needs no loss scaling.
- **EMA** of weights after every taken step (reference train.py:58-64).
- **Gradient noise** on encoder grads (train_utils/grad_noise_scheduler.py):
  the std scalar is computed host-side per step (schedules.GradNoiseSchedule)
  and passed in, so no recompilation as it decays.

Batch layout (accumulation-major, time-major):
  feats      [A, T, B, F]   float
  feat_lens  [A, B]         int32
  txt        [A, B, U]      int32
  txt_lens   [A, B]         int32
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from caiman_asr_tpu.models.rnnt import RNNT
from caiman_asr_tpu.ops.transducer_loss import LossModifiers, transducer_loss_from_fg

BATCH_DIMS = {"feats": 2, "feat_lens": 1, "txt": 1, "txt_lens": 1}


class TrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar, counts *taken* optimizer steps


def init_train_state(
    model: RNNT, optimizer, rng: jax.Array, pruned_loss: bool = False
) -> TrainState:
    params = model.init(rng)
    if pruned_loss:
        from caiman_asr_tpu.ops.pruned_loss import init_simple_params

        params.update(
            init_simple_params(
                jax.random.fold_in(rng, 0x51), model.cfg.joint_n_hid,
                model.n_classes,
            )
        )
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _cast_compute(params, feats, compute_dtype):
    """bf16 mixed precision (the reference trains under AMP by default,
    args/train.py --no_amp): matrices/activations in bf16, vectors (biases)
    and master weights f32. No loss scaling needed on TPU."""
    if compute_dtype is None:
        return params, feats
    cast = lambda p: (
        p.astype(compute_dtype)
        if p.dtype == jnp.float32 and p.ndim > 1
        else p
    )
    return jax.tree.map(cast, params), feats.astype(compute_dtype)


def _micro_loss(
    model: RNNT,
    params,
    mb: Dict[str, jax.Array],
    rng: jax.Array,
    mods: LossModifiers,
    denom: jax.Array,
    blank_idx: int,
    compute_dtype=None,
    collect_bn: bool = False,
    pack_to=None,
    vocab_axis=None,
    pruned_range: int = 0,
    simple_scale: float = 0.5,
):
    """Normalised loss for one microbatch. feats: [T, B, F].

    With collect_bn=True (batch-norm LSTM variant) returns
    (loss, tuple of per-BN-layer (batch_mean, unbiased_batch_var)).
    With pruned_range > 0, the pruned two-stage objective replaces the
    dense loss (ops/pruned_loss.py; pack_to is ignored — the band already
    bounds compute)."""
    params, feats = _cast_compute(params, mb["feats"], compute_dtype)
    bn_updates: list = [] if collect_bn else None
    rng_model, rng_joint = jax.random.split(rng)
    (f, f_lens), (g, _), _ = model.enc_pred(
        params,
        feats,
        mb["feat_lens"],
        mb["txt"],
        mb["txt_lens"],
        train=True,
        rng=rng_model,
        bn_updates=bn_updates,
    )
    if pruned_range > 0:
        from caiman_asr_tpu.ops.pruned_loss import pruned_transducer_loss_from_fg

        per_utt = pruned_transducer_loss_from_fg(
            f,
            g,
            params["joint_fc"]["w"],
            params["joint_fc"]["b"],
            {"simple_am": params["simple_am"], "simple_lm": params["simple_lm"]},
            mb["txt"],
            f_lens,
            mb["txt_lens"],
            blank_idx,
            mods,
            prune_range=pruned_range,
            simple_scale=simple_scale,
            dropout_rng=rng_joint,
            dropout_rate=model.cfg.joint_dropout,
            vocab_axis=vocab_axis,
        )
    else:
        per_utt = transducer_loss_from_fg(
            f,
            g,
            params["joint_fc"]["w"],
            params["joint_fc"]["b"],
            mb["txt"],
            f_lens,
            mb["txt_lens"],
            blank_idx,
            mods,
            dropout_rng=rng_joint,
            dropout_rate=model.cfg.joint_dropout,
            pack_to=pack_to,
            vocab_axis=vocab_axis,
        )
    loss = per_utt.sum() / denom
    if collect_bn:
        return loss, tuple(bn_updates)
    return loss


def _micro_loss_rsp(
    model: RNNT,
    params,
    mb: Dict[str, jax.Array],
    rng: jax.Array,
    mods: LossModifiers,
    denom: jax.Array,
    blank_idx: int,
    rnnt_state,
    gate: jax.Array,
    compute_dtype=None,
    pack_to=None,
    pruned_range: int = 0,
    simple_scale: float = 0.5,
):
    """RSP microbatch loss: threads (gated) streaming state and returns the
    new state for the next microbatch (stop-gradient'd — the reference
    detaches carried state, train_utils/rsp.py:103-205)."""
    B = mb["feats"].shape[1]
    gate_b = jnp.broadcast_to(gate, (B,))
    params, feats_c = _cast_compute(params, mb["feats"], compute_dtype)
    rng_model, rng_joint = jax.random.split(rng)
    (f, f_lens), (g, _), new_state = model.enc_pred(
        params,
        feats_c,
        mb["feat_lens"],
        mb["txt"],
        mb["txt_lens"],
        rnnt_state,
        state_gate=gate_b,
        train=True,
        rng=rng_model,
    )
    if pruned_range > 0:
        from caiman_asr_tpu.ops.pruned_loss import pruned_transducer_loss_from_fg

        per_utt = pruned_transducer_loss_from_fg(
            f,
            g,
            params["joint_fc"]["w"],
            params["joint_fc"]["b"],
            {"simple_am": params["simple_am"], "simple_lm": params["simple_lm"]},
            mb["txt"],
            f_lens,
            mb["txt_lens"],
            blank_idx,
            mods,
            prune_range=pruned_range,
            simple_scale=simple_scale,
            dropout_rng=rng_joint,
            dropout_rate=model.cfg.joint_dropout,
        )
    else:
        per_utt = transducer_loss_from_fg(
            f,
            g,
            params["joint_fc"]["w"],
            params["joint_fc"]["b"],
            mb["txt"],
            f_lens,
            mb["txt_lens"],
            blank_idx,
            mods,
            dropout_rng=rng_joint,
            dropout_rate=model.cfg.joint_dropout,
            pack_to=pack_to,
        )
    # detach + match the carry dtypes (state stays f32 under bf16 compute)
    new_state = jax.tree.map(
        lambda n, o: jax.lax.stop_gradient(n).astype(o.dtype), new_state, rnnt_state
    )
    return per_utt.sum() / denom, new_state


def _finish_step(
    state: TrainState,
    grads,
    total_loss,
    rng,
    scalars,
    optimizer,
    ema_decay,
    grad_noise,
    apply_bn=None,
    collect_layer_stats=False,
):
    """Shared post-gradient tail: noise -> clip-free LAMB -> EMA -> atomic
    non-finite skip. Used by both the DP and the TP train steps so the
    guard/update semantics cannot diverge."""
    good = jnp.isfinite(total_loss)

    def _add_noise(grads):
        if not grad_noise:
            return grads
        noise_rng = jax.random.fold_in(rng, 1 << 20)
        leaves, treedef = jax.tree.flatten(grads["encoder"])
        keys = jax.random.split(noise_rng, len(leaves))
        noisy = [
            g + scalars["grad_noise_std"] * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        return dict(grads, encoder=jax.tree.unflatten(treedef, noisy))

    # Fused LAMB finish (training/fused_finish.py): the optax chain + the
    # post-hoc where-selects below are ~6 full passes over the param-sized
    # trees (~76 ms at large-196M); the fused path is 3 (~16 ms). Taken
    # whenever the optimizer came from build_optimizer (the registry knows
    # its cfg/schedule) and there is no batch-norm overwrite to interleave.
    # CAIMAN_FUSED_FINISH=0 forces the optax path (A/B, debugging).
    if (
        apply_bn is None
        and os.environ.get("CAIMAN_FUSED_FINISH", "1") == "1"
    ):
        from caiman_asr_tpu.training import fused_finish as _ff
        from caiman_asr_tpu.training.optimizer import fused_spec_for

        spec = fused_spec_for(optimizer)
        if spec is None or not _ff.probe_supported(state.opt_state):
            # surface the silent ~5x fallback once: an equal-but-not-
            # identical GradientTransformation (rebuilt elsewhere, module
            # reload) misses the identity-keyed registry
            import sys as _sys

            if not getattr(_finish_step, "_warned_unfused", False):
                _finish_step._warned_unfused = True
                print(
                    "[fused-finish] optimizer not in build_optimizer's "
                    "registry (or unexpected opt-state shape); taking the "
                    "~5x slower optax finish path",
                    file=_sys.stderr,
                )
        else:
            if os.environ.get("CAIMAN_FUSED_FINISH_DEBUG"):
                print("[fused-finish] taking the fused LAMB path",
                      file=__import__("sys").stderr)
            # the non-finite guard is folded INTO the fused passes
            # (fused_finish nan_to_nums each gradient leaf on the fly —
            # no standalone tree-wide pass)
            if grad_noise:
                grads = _add_noise(jax.tree.map(jnp.nan_to_num, grads))
            cfg, factors, schedule = spec
            new_params, new_ema, new_opt, grad_norm = _ff.fused_lamb_ema_update(
                state.params, state.ema_params, state.opt_state, grads,
                good, cfg, factors, schedule, ema_decay,
            )
            new_state = TrainState(
                params=new_params,
                ema_params=new_ema,
                opt_state=new_opt,
                step=state.step + good.astype(jnp.int32),
            )
            metrics = {
                "loss": total_loss,
                "grad_norm": grad_norm,
                "skipped": (~good).astype(jnp.int32),
            }
            if collect_layer_stats:
                from caiman_asr_tpu.log.layer_stats import layer_stats_vec

                metrics["layer_stats"] = layer_stats_vec(
                    state.params, jax.tree.map(jnp.nan_to_num, grads)
                )
            return new_state, metrics, good

    # optax fallback path (batch-norm models, custom optimizers, opt-out).
    # Replace non-finite grads with zeros so the (discarded) update path
    # still computes without poisoning opt state on the taken path.
    grads = _add_noise(jax.tree.map(jnp.nan_to_num, grads))
    grad_norm = optax.global_norm(grads)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if apply_bn is not None:
        new_params = apply_bn(new_params)
    new_ema = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        state.ema_params,
        new_params,
    )
    pick = lambda a, b: jax.tree.map(lambda x, y: jnp.where(good, x, y), a, b)
    new_state = TrainState(
        params=pick(new_params, state.params),
        ema_params=pick(new_ema, state.ema_params),
        opt_state=pick(new_opt_state, state.opt_state),
        step=state.step + good.astype(jnp.int32),
    )
    metrics = {
        "loss": total_loss,
        "grad_norm": grad_norm,
        "skipped": (~good).astype(jnp.int32),
    }
    if collect_layer_stats:
        from caiman_asr_tpu.log.layer_stats import layer_stats_vec

        metrics["layer_stats"] = layer_stats_vec(state.params, grads)
    return new_state, metrics, good


def make_train_step(
    model: RNNT,
    optimizer: optax.GradientTransformation,
    blank_idx: int,
    *,
    ema_decay: float = 0.999,
    eos_idx: int = -1,
    star_idx: int = -1,
    eos_penalty: float = 0.0,
    grad_noise: bool = False,
    rsp: bool = False,
    compute_dtype=None,
    donate: bool = True,
    collect_layer_stats: bool = False,
    pruned_range: int = 0,
    simple_loss_scale: float = 0.5,
):
    """Build the jitted train step.

    Returns fn(state, batch, rng, scalars) -> (state, metrics) where scalars
    is {"delay_penalty": f32, "star_penalty": f32, "grad_noise_std": f32}
    (host-scheduled values; traced, so no recompiles as they change).

    With rsp=True the signature becomes
    fn(state, batch, rng, scalars, rnnt_state, state_gates[A])
      -> (state, metrics, new_rnnt_state)
    where state_gates[i] in {0, 1} gates whether microbatch i continues from
    the carried streaming state (training.rsp.RSPController supplies them).

    Batch-norm LSTM variant: each microbatch's batch statistics are folded
    into the running stats sequentially through the grad-accum scan (torch
    momentum rule); the optimizer's (weight-decayed, zero-gradient) update
    to the stat leaves is overwritten afterwards.
    """
    has_bn = model.has_batch_norm
    if rsp and has_bn:
        # mirror the reference's constraint (train_utils/rsp.py:54-61)
        raise NotImplementedError(
            "random state passing is not supported with batch-norm LSTMs"
        )

    def step_fn(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        scalars: Dict[str, jax.Array],
        rnnt_state=None,
        state_gates=None,
        pack_to=None,
    ):
        A = batch["feats"].shape[0]
        B = batch["feats"].shape[2]
        denom = jnp.asarray(A * B, jnp.float32)
        mods = LossModifiers(
            delay_penalty=scalars["delay_penalty"],
            eos_penalty=eos_penalty,
            eos_idx=eos_idx,
            star_penalty=scalars["star_penalty"],
            star_idx=star_idx,
        )

        # A == 1 is a static shape: skip the accumulation scan entirely —
        # the scan's zero-init + add of the fp32 grad tree is a full
        # param-tree round trip of HBM traffic that buys nothing.
        if rsp:
            grad_fn = jax.value_and_grad(
                partial(
                    _micro_loss_rsp, model, mods=mods, denom=denom,
                    blank_idx=blank_idx, compute_dtype=compute_dtype,
                    pack_to=pack_to, pruned_range=pruned_range,
                    simple_scale=simple_loss_scale,
                ),
                has_aux=True,
            )
            gates = jnp.asarray(state_gates, jnp.float32)
            if A == 1:
                mb = jax.tree.map(lambda x: x[0], batch)
                (total_loss, final_rs), grads = grad_fn(
                    state.params, mb, jax.random.fold_in(rng, 0),
                    rnnt_state=rnnt_state, gate=gates[0],
                )
            else:

                def accum(carry, inp):
                    grads_acc, loss_acc, rs = carry
                    mb, i, gate = inp
                    mb_rng = jax.random.fold_in(rng, i)
                    (loss, new_rs), grads = grad_fn(
                        state.params, mb, mb_rng, rnnt_state=rs, gate=gate
                    )
                    grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                    return (grads_acc, loss_acc + loss, new_rs), None

                zero_grads = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                (grads, total_loss, final_rs), _ = lax.scan(
                    accum,
                    (zero_grads, jnp.zeros((), jnp.float32), rnnt_state),
                    (batch, jnp.arange(A), gates),
                )
        else:
            grad_fn = jax.value_and_grad(
                partial(
                    _micro_loss, model, mods=mods, denom=denom,
                    blank_idx=blank_idx, compute_dtype=compute_dtype,
                    collect_bn=has_bn, pack_to=pack_to,
                    pruned_range=pruned_range,
                    simple_scale=simple_loss_scale,
                ),
                has_aux=has_bn,
            )
            from caiman_asr_tpu.ops.lstm import BN_MOMENTUM

            def fold_bn(bn_stats, batch_stats):
                return tuple(
                    (
                        (1 - BN_MOMENTUM) * m + BN_MOMENTUM * bm,
                        (1 - BN_MOMENTUM) * v + BN_MOMENTUM * bv,
                    )
                    for (m, v), (bm, bv) in zip(bn_stats, batch_stats)
                )

            if A == 1:
                mb = jax.tree.map(lambda x: x[0], batch)
                mb_rng = jax.random.fold_in(rng, 0)
                if has_bn:
                    (total_loss, batch_stats), grads = grad_fn(
                        state.params, mb, mb_rng
                    )
                    final_bn = fold_bn(model.bn_stats(state.params), batch_stats)
                else:
                    total_loss, grads = grad_fn(state.params, mb, mb_rng)
                    final_bn = model.bn_stats(state.params)
            else:

                def accum(carry, inp):
                    grads_acc, loss_acc, bn_stats = carry
                    mb, i = inp
                    mb_rng = jax.random.fold_in(rng, i)
                    if has_bn:
                        (loss, batch_stats), grads = grad_fn(state.params, mb, mb_rng)
                        bn_stats = fold_bn(bn_stats, batch_stats)
                    else:
                        loss, grads = grad_fn(state.params, mb, mb_rng)
                    grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                    return (grads_acc, loss_acc + loss, bn_stats), None

                zero_grads = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                (grads, total_loss, final_bn), _ = lax.scan(
                    accum,
                    (zero_grads, jnp.zeros((), jnp.float32),
                     model.bn_stats(state.params)),
                    (batch, jnp.arange(A)),
                )

        new_state, metrics, good = _finish_step(
            state, grads, total_loss, rng, scalars, optimizer, ema_decay,
            grad_noise,
            apply_bn=(
                (lambda p: model.apply_bn_updates(p, list(final_bn)))
                if has_bn and not rsp
                else None
            ),
            collect_layer_stats=collect_layer_stats,
        )
        if rsp:
            # A NaN step may mean the carried state is poisoned: zero it
            # (host also resets its history counter, reference rsp.py:86-99).
            new_rs = jax.tree.map(
                lambda x: jnp.where(good, x, jnp.zeros_like(x)), final_rs
            )
            return new_state, metrics, new_rs
        return new_state, metrics

    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        static_argnames=("pack_to",),
    )


def joint_fc_pspecs(params, model_axis: str = "model"):
    """PartitionSpec pytree for the params: replicated everywhere except
    joint_fc.w [K, Hj] / joint_fc.b [K] sharded on the vocab dim over
    ``model_axis`` (the layout vocab_parallel.vp_joint_lse consumes).
    The pruned-loss simple heads (same [K, Hj] shape) shard identically."""
    from jax.sharding import PartitionSpec as P

    specs = jax.tree.map(lambda _: P(), params)
    vocab = {"w": P(model_axis, None), "b": P(model_axis)}
    specs["joint_fc"] = dict(vocab)
    for k in ("simple_am", "simple_lm"):
        if k in params:
            specs[k] = dict(vocab)
    return specs


def make_train_step_tp(
    model: RNNT,
    optimizer: optax.GradientTransformation,
    mesh,
    blank_idx: int,
    *,
    ema_decay: float = 0.999,
    eos_idx: int = -1,
    star_idx: int = -1,
    eos_penalty: float = 0.0,
    grad_noise: bool = False,
    compute_dtype=None,
    donate: bool = True,
    data_axis: str = "data",
    model_axis: str = "model",
    collect_layer_stats: bool = False,
    pruned_range: int = 0,
    simple_loss_scale: float = 0.5,
):
    """Tensor-parallel train step over a 2-D (data x model) mesh.

    The joint vocab projection (the FLOP-dominant GEMM) is sharded over
    ``model_axis`` via the vocab-parallel loss (parallel/vocab_parallel.py);
    everything else is replicated over model and data-parallel over
    ``data_axis``. The value-and-grad runs under shard_map with an explicit
    psum over data; the optimizer/EMA/guard tail runs under the outer jit
    where GSPMD handles the sharded joint_fc leaves (LAMB's per-tensor
    norms all-reduce automatically).

    The caller must device_put params/ema/opt-state with joint_fc_pspecs
    shardings and the batch with the data-axis batch shardings. RSP and
    batch-norm variants are DP-only (use make_train_step).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if model.has_batch_norm:
        raise NotImplementedError("TP step: batch-norm LSTM variant is DP-only")

    def grads_body(params, batch, rng, scalars, pack_to):
        A = batch["feats"].shape[0]
        B_local = batch["feats"].shape[2]
        n_data = lax.psum(jnp.ones((), jnp.float32), data_axis)
        denom = A * B_local * n_data  # global utterance count
        mods = LossModifiers(
            delay_penalty=scalars["delay_penalty"],
            eos_penalty=eos_penalty,
            eos_idx=eos_idx,
            star_penalty=scalars["star_penalty"],
            star_idx=star_idx,
        )
        # distinct augmentation/dropout RNG per data shard; SAME rng across
        # model shards (the joint-dropout mask must agree on every vocab
        # shard since h is replicated over model)
        rng_l = jax.random.fold_in(rng, lax.axis_index(data_axis))
        grad_fn = jax.value_and_grad(
            partial(
                _micro_loss, model, mods=mods, denom=denom,
                blank_idx=blank_idx, compute_dtype=compute_dtype,
                collect_bn=False, pack_to=pack_to, vocab_axis=model_axis,
                pruned_range=pruned_range, simple_scale=simple_loss_scale,
            )
        )
        if A == 1:  # static: skip the scan's fp32 grad-tree zero+add traffic
            mb = jax.tree.map(lambda x: x[0], batch)
            total_loss, grads = grad_fn(params, mb, jax.random.fold_in(rng_l, 0))
        else:
            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )

            def accum(carry, inp):
                grads_acc, loss_acc = carry
                mb, i = inp
                loss, grads = grad_fn(params, mb, jax.random.fold_in(rng_l, i))
                return (jax.tree.map(jnp.add, grads_acc, grads), loss_acc + loss), None

            (grads, total_loss), _ = lax.scan(
                accum, (zero_grads, jnp.zeros((), jnp.float32)),
                (batch, jnp.arange(A)),
            )
        # DP reduction (the DDP all-reduce); model-axis grads are already
        # correct (replicated leaves: identical per shard; joint_fc: local)
        grads = lax.psum(grads, data_axis)
        total_loss = lax.psum(total_loss, data_axis)
        return total_loss, grads

    def step_fn(state: TrainState, batch, rng, scalars, pack_to=None):
        pspec = joint_fc_pspecs(state.params, model_axis)
        bspec = {
            k: P(*([None] * BATCH_DIMS[k] + [data_axis]
                   + [None] * (batch[k].ndim - BATCH_DIMS[k] - 1)))
            for k in batch
        }
        total_loss, grads = shard_map(
            partial(grads_body, pack_to=pack_to),
            mesh=mesh,
            in_specs=(pspec, bspec, P(), P()),
            out_specs=(P(), pspec),
            check_vma=False,
        )(state.params, batch, rng, scalars)

        new_state, metrics, _ = _finish_step(
            state, grads, total_loss, rng, scalars, optimizer, ema_decay,
            grad_noise, collect_layer_stats=collect_layer_stats,
        )
        return new_state, metrics

    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
        static_argnames=("pack_to",),
    )


def make_val_loss_step(model: RNNT, blank_idx: int):
    """Jitted validation loss: batch {feats [T,B,F], feat_lens, txt, txt_lens}
    -> summed loss + utterance count (host averages across batches/hosts)."""

    def val_fn(params, batch):
        (f, f_lens), (g, _), _ = model.enc_pred(
            params,
            batch["feats"],
            batch["feat_lens"],
            batch["txt"],
            batch["txt_lens"],
            train=False,
        )
        per_utt = transducer_loss_from_fg(
            f,
            g,
            params["joint_fc"]["w"],
            params["joint_fc"]["b"],
            batch["txt"],
            f_lens,
            batch["txt_lens"],
            blank_idx,
        )
        return per_utt.sum(), jnp.asarray(per_utt.shape[0], jnp.float32)

    return jax.jit(val_fn)
