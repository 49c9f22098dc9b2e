"""Second-stage step-gap probe: the finish in ISOLATION is ~16 ms, yet the
full step runs ~76 ms over the grad-only graph. Bisect by swapping the
finish for progressively simpler tails inside the SAME step structure:

  tail=sgd    p' = p - 1e-9 * g                   (one fused pass)
  tail=none   return grads' first leaf + state unchanged
  tail=real   the actual _finish_step (fused or optax per env)

Usage: python scripts/probe_step_gap2.py [-B 96]
"""

import argparse
import sys
import time
from functools import partial

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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.ops.transducer_loss import (
        LossModifiers, transducer_loss_from_fg,
    )
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import (
        TrainState, _finish_step, _micro_loss, init_train_state,
    )

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
    scalars = {"delay_penalty": jnp.zeros(()), "star_penalty": jnp.zeros(()),
               "grad_noise_std": jnp.zeros(())}
    key = jax.random.PRNGKey(1)
    mods = LossModifiers(
        delay_penalty=scalars["delay_penalty"], eos_penalty=0.0, eos_idx=-1,
        star_penalty=scalars["star_penalty"], star_idx=-1,
    )
    denom = jnp.asarray(B, jnp.float32)
    grad_fn = jax.value_and_grad(partial(
        _micro_loss, model, mods=mods, denom=denom, blank_idx=blank,
        compute_dtype=jnp.bfloat16, collect_bn=False, pack_to=None,
        pruned_range=0, simple_scale=0.5,
    ))

    def make(tail):
        def step_fn(state, batch, rng, scalars):
            total_loss, grads = grad_fn(
                state.params, batch, jax.random.fold_in(rng, 0))
            if tail == "none":
                return state, {"loss": total_loss,
                               "g0": jax.tree.leaves(grads)[0].sum()}
            if tail == "sgd":
                newp = jax.tree.map(lambda p, g: p - 1e-9 * g,
                                    state.params, grads)
                return TrainState(params=newp, ema_params=state.ema_params,
                                  opt_state=state.opt_state,
                                  step=state.step + 1), {"loss": total_loss}
            new_state, metrics, _good = _finish_step(
                state, grads, total_loss, rng, scalars, opt, 0.999, False)
            return new_state, metrics
        return jax.jit(step_fn, donate_argnums=(0,))

    for tail in ("none", "sgd", "real"):
        step = make(tail)
        st = state
        # fresh state per variant (donation consumes buffers)
        st = init_train_state(model, opt, jax.random.PRNGKey(0))
        for _ in range(2):
            st, m = step(st, mb, key, scalars)
        _fetch(st if tail != "none" else m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, m = step(st, mb, key, scalars)
        _fetch(st if tail != "none" else m)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"tail={tail:5s}: {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
