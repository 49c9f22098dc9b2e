"""Measure beam-mode StreamingEngine throughput WITH per-tick host
consumption of the windowed decoder outputs (the real serving loop cost,
not compute-only dispatch).

Usage: python scripts/bench_beam_serving.py [--batch 1024] [--model base]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--model", choices=["base", "large"], default="base")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--pipeline_depth", type=int, default=1)
    ap.add_argument("--decoder", choices=["beam", "greedy"], default="beam")
    ap.add_argument(
        "--reuse-upload", action="store_true",
        help="elide the host->device byte shipping (co-located tier: on "
             "this rig that hop is a 19-55 MB/s WAN tunnel; PCIe ships the "
             "same bytes in ~1-2 ms — see bench.py docstring)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.serving.engine import StreamingEngine

    if args.model == "base":
        cfg = RNNTModelConfig(
            in_feats=240, enc_n_hid=1024, enc_pre_rnn_layers=2,
            enc_post_rnn_layers=6, enc_stack_time_factor=2,
            pred_n_hid=512, pred_rnn_layers=2, joint_n_hid=768,
        )
        n_classes = 8704
    else:
        cfg = RNNTModelConfig(
            in_feats=240, enc_n_hid=1536, enc_pre_rnn_layers=2,
            enc_post_rnn_layers=6, enc_stack_time_factor=2,
            pred_n_hid=768, pred_rnn_layers=2, joint_n_hid=1024,
        )
        n_classes = 17408
    model = RNNT(cfg, n_classes=n_classes)
    params = model.init(jax.random.PRNGKey(0))

    eng = StreamingEngine(
        model, params, blank_idx=n_classes - 1, tokenizer=None,
        max_streams=args.batch, decoder=args.decoder, beam_width=4,
        max_symbols_per_step=8, dtype=jnp.bfloat16,
        pipeline_depth=args.pipeline_depth,
    )
    for i in range(args.batch):
        eng.open_stream()
    print(f"warmup (B={args.batch}, {args.model}, {args.decoder}, "
          f"depth={args.pipeline_depth})...", flush=True)
    eng.warmup()

    rng = np.random.default_rng(0)
    block = (rng.standard_normal((args.batch, eng.hop_samples)) * 0.05 * 32768
             ).astype(np.int16)

    # feed + tick loop: every tick pays the full host path (windowed fetch +
    # response serialisation for every lane)
    def feed():
        eng.push_audio_block(block)

    feed()
    # enable the upload cache only now: caching the warmup tick would pin
    # an all-zero staging matrix and every timed tick would decode silence
    # (no tokens, no responses -> the host serialisation cost vanishes)
    eng._bench_reuse_upload = args.reuse_upload
    eng.tick()  # absorbs any remaining first-call effects; caches real audio
    times = []
    for _ in range(args.iters):
        feed()
        t0 = time.perf_counter()
        out = eng.tick()
        times.append(time.perf_counter() - t0)
    times.sort()
    mean = sum(times) / len(times)
    p99 = times[int(len(times) * 0.99) - 1] if len(times) > 1 else times[-1]
    rts = args.batch * 0.060 / mean
    print(
        f"B={args.batch} {args.model} {args.decoder}: mean {mean*1e3:.1f} ms  "
        f"p99 {p99*1e3:.1f} ms  -> {rts:,.0f} RTS "
        f"({'REAL-TIME OK' if p99 <= 0.060 else 'over budget'}); "
        f"responses last tick: {len(out)}"
    )
    eng.close()  # stop uploader/fetcher threads before interpreter teardown


if __name__ == "__main__":
    main()
