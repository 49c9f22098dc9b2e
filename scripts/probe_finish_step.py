"""Time the train step's post-gradient tail (_finish_step: nan guard ->
LAMB -> EMA -> non-finite skip select) in isolation at base/large size.

The step breakdown (scripts/bench_train.py) leaves ~30 ms at large-196M
unaccounted between the enc and loss backward measurements; this pins down
how much of it is the optimizer tail vs roofline (LAMB+EMA touch ~8 GB of
HBM at 196M fp32 params -> ~10 ms at 810 GB/s).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_finish_step.py [--large]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import _finish_step, init_train_state

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
    opt = build_optimizer(OptimizerConfig(), model.param_lr_factors())
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M")

    grads = jax.tree.map(lambda p: jnp.full(p.shape, 1e-4, jnp.float32),
                         state.params)
    scalars = {"grad_noise_std": jnp.zeros(())}
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def tail(state, grads):
        new_state, metrics, _ = _finish_step(
            state, grads, jnp.float32(1.0), rng, scalars, opt, 0.999, False
        )
        return new_state, metrics

    tail_d = jax.jit(tail, donate_argnums=(0,))

    for name, fn in (("tail (no donate)", tail), ("tail (donated)", tail_d)):
        # chain state through the calls (exactly how the train loop uses it)
        st, metrics = fn(jax.tree.map(jnp.copy, state), grads)
        float(metrics["loss"])  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, metrics = fn(st, grads)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
