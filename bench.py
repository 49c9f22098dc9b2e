"""Headline benchmark: concurrent real-time streams per chip (base-85M, greedy).

Measures the full streaming serving hot path per 60 ms of audio per stream:
stateful encoder chunk (2 x 30 ms stacked frames -> StackTime(2) -> 1 encoder
output frame) + one jitted greedy decode step (joint + argmax +
prediction-net advance), batched over B concurrent streams.

A batch of B streams is sustainable in real time iff the chunk wall time
t <= 60 ms; reported RTS = max over the batch ladder of B * 0.060 / t
(linear-throughput estimate, equals B at the real-time boundary).

Baseline: 2000 RTS for base-85M greedy on one FPGA card
(reference docs/src/performance.md:23; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_RTS = 2000.0
CHUNK_SECONDS = 0.060


def build(batch_size: int, dtype=jnp.bfloat16):
    from caiman_asr_tpu.decoding.greedy import init_decode_state, make_streaming_step
    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.models.state import EncoderState

    cfg = RNNTModelConfig(
        in_feats=240,
        enc_n_hid=1024,
        enc_pre_rnn_layers=2,
        enc_post_rnn_layers=6,
        enc_stack_time_factor=2,
        pred_n_hid=512,
        pred_rnn_layers=2,
        joint_n_hid=768,
    )
    model = RNNT(cfg, n_classes=8704)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    decode_step = make_streaming_step(model, blank_idx=8703, max_symbols_per_step=4)

    def zeros_state(layers, B, H):
        return (jnp.zeros((layers, B, H), dtype), jnp.zeros((layers, B, H), dtype))

    enc_state = EncoderState(
        pre_rnn=zeros_state(cfg.enc_pre_rnn_layers, batch_size, cfg.enc_n_hid),
        post_rnn=zeros_state(cfg.enc_post_rnn_layers, batch_size, cfg.enc_n_hid),
    )
    dec_state = init_decode_state(model, params, batch_size)
    dec_state = jax.tree.map(lambda x: x.astype(dtype), dec_state)

    lens = jnp.full((batch_size,), 2, jnp.int32)

    def chunk_step(params, x, enc_state, dec_state):
        f, _, new_enc_state = model.encode(params, x, lens, enc_state)
        toks, n, new_dec_state = decode_step(params, f[:, 0], dec_state)
        return toks, n, new_enc_state, new_dec_state

    step = jax.jit(chunk_step, donate_argnums=(2, 3))
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, batch_size, 240)), dtype
    )
    return step, params, x, enc_state, dec_state


def measure(batch_size: int, iters: int = 30) -> float:
    step, params, x, enc_state, dec_state = build(batch_size)
    # warmup / compile (np.asarray: block_until_ready is dispatch-only on
    # tunnelled backends — a host fetch is the only reliable barrier)
    import numpy as np

    toks, n, enc_state, dec_state = step(params, x, enc_state, dec_state)
    _ = np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(iters):
        toks, n, enc_state, dec_state = step(params, x, enc_state, dec_state)
    # state is chained through every iteration; fetching the final tokens
    # forces completion of all of them
    _ = np.asarray(toks)
    return (time.perf_counter() - t0) / iters


def main():
    platform = jax.devices()[0].platform
    ladder = [4096, 8192, 16384] if platform == "tpu" else [8]
    best_rts, best = 0.0, None
    for B in ladder:
        try:
            t = measure(B)
        except Exception:
            break
        rts = B * CHUNK_SECONDS / t
        if rts > best_rts:
            best_rts, best = rts, (B, t)
    B, t = best
    print(
        json.dumps(
            {
                "metric": "streaming_rts_base85m_greedy",
                "value": round(best_rts, 1),
                "unit": f"real-time streams/chip (B={B}, {t * 1e3:.2f} ms/60ms-chunk, {platform})",
                "vs_baseline": round(best_rts / BASELINE_RTS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
