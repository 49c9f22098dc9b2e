"""Phase breakdown of one engine tick at a given batch size.

Times, separately: host staging fill, host->device upload of the staging
matrix, the jitted tick program (device), the packed-output fetch, and the
full tick() loop — to locate transport vs compute vs host-CPU bottlenecks
on the current backend (tunnelled TPU numbers include WAN RTT).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_tick_phases.py [-B 2048]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    ap.add_argument("--model", choices=["base", "large"], default="base")
    args = ap.parse_args()
    B = args.B

    import jax
    import jax.numpy as jnp

    if args.decoder == "greedy" and args.model == "base":
        from bench import _build_engine

        eng = _build_engine(B)
    else:
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
            max_streams=B, decoder=args.decoder, beam_width=4,
            max_symbols_per_step=8 if args.decoder == "beam" else 4,
            dtype=jnp.bfloat16, pipeline_depth=8,
        )
    for _ in range(B):
        eng.open_stream()
    eng.warmup()
    rng = np.random.default_rng(0)
    block = (rng.standard_normal((B, eng.hop_samples)) * 0.05 * 32768).astype(
        np.int16
    )

    def timed(name, fn, iters=args.iters):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms")
        return dt

    # 1. host staging alone (native path): push + fill staging matrix
    staging = np.zeros((B, eng.hop_samples), np.int16)

    def stage():
        eng.push_audio_block(block)
        if eng._native_stg is not None:
            eng._native_stg.tick(staging, eng._active, eng._closed)

    timed("host staging (push+fill)", stage)

    # 2. upload alone: device_put of the staging matrix, forced by fetching
    #    a data-dependent scalar through a trivial jit
    probe = jax.jit(lambda x: x[0, 0] + x[-1, -1])

    def upload():
        d = jnp.asarray(staging)
        np.asarray(probe(d))

    t_up = timed("upload staging (+RTT probe)", upload)

    # RTT floor: same probe on a pre-uploaded array
    d0 = jnp.asarray(staging)
    np.asarray(probe(d0))
    t_rtt = timed("RTT floor (tiny fetch)", lambda: np.asarray(probe(d0)))
    nbytes = staging.nbytes
    bw = nbytes / max(t_up - t_rtt, 1e-9) / 1e6
    print(f"{'-> upload bandwidth':28s} {bw:8.1f} MB/s ({nbytes/1e6:.1f} MB/tick)")

    # 3. device tick program, chained, one fetch per group of 5
    meta = np.zeros(3 * B + 1, np.int32)
    meta[:B] = 1
    carry, enc, dec = eng._carry, eng.enc_state, eng.dec_state
    samples_dev = jnp.asarray(staging)
    packed = None

    def dev5():
        nonlocal carry, enc, dec, packed
        for i in range(5):
            meta[-1] += 1
            packed, carry, enc, dec = eng._jit_tick(
                eng.params, samples_dev, carry, enc, dec, eng._init_dec,
                jnp.asarray(meta),
            )
        np.asarray(packed)

    t5 = timed("5x device tick (+1 fetch)", dev5, iters=max(args.iters // 5, 3))
    print(f"{'-> device tick each':28s} {t5 / 5 * 1e3:8.2f} ms")
    # restore the (donated-through) state chain so full tick() still works
    eng._carry, eng.enc_state, eng.dec_state = carry, enc, dec

    # 4. packed fetch alone
    timed("packed fetch", lambda: np.asarray(packed))

    # 5. full tick() loop (what bench.py measures)
    def one_tick():
        eng.push_audio_block(block)
        eng.tick()

    timed("full tick()", one_tick)
    eng.close()


if __name__ == "__main__":
    main()
