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


def measure(batch_size: int, iters: int = 30):
    """Returns (mean_chunk_seconds, p99_chunk_seconds)."""
    step, params, x, enc_state, dec_state = build(batch_size)
    # warmup x2 (second pass absorbs the weak-type retrace); np.asarray:
    # block_until_ready is dispatch-only on tunnelled backends — a host
    # fetch is the only reliable barrier
    import numpy as np

    for _ in range(2):
        toks, n, enc_state, dec_state = step(params, x, enc_state, dec_state)
    _ = np.asarray(toks)
    # time in groups of 10 chained chunks with one host fetch per group:
    # amortizes the transport round trip (which co-located serving does not
    # pay) while still bounding tail behaviour per group
    group = 10
    times = []
    for _ in range(max(iters // group, 3)):
        t0 = time.perf_counter()
        for _ in range(group):
            toks, n, enc_state, dec_state = step(params, x, enc_state, dec_state)
        _ = np.asarray(n)
        times.append((time.perf_counter() - t0) / group)
    times.sort()
    mean = sum(times) / len(times)
    p99 = times[-1]
    return mean, p99


def main():
    platform = jax.devices()[0].platform
    ladder = [4096, 8192, 16384] if platform == "tpu" else [8]
    results = []
    for B in ladder:
        try:
            t, p99 = measure(B)
        except Exception:
            break
        results.append((B, t, p99))
    # headline = the largest batch whose p99 chunk time fits the real-time
    # budget: B streams VERIFIED sustainable (no extrapolation); fall back
    # to the best throughput estimate if nothing fits
    verified = [(B, t, p99) for B, t, p99 in results if p99 <= CHUNK_SECONDS]
    if verified:
        B, t, p99 = max(verified)
        value = float(B)
        kind = "verified"
    else:
        B, t, p99 = max(results, key=lambda r: r[0] / r[1])
        value = round(B * CHUNK_SECONDS / t, 1)
        kind = "throughput-extrapolated"
    print(
        json.dumps(
            {
                "metric": "streaming_rts_base85m_greedy",
                "value": value,
                "unit": (
                    f"{kind} real-time streams/chip ({t * 1e3:.2f} ms mean / "
                    f"{p99 * 1e3:.2f} ms p99 per 60 ms chunk at B={B}, {platform})"
                ),
                "vs_baseline": round(value / BASELINE_RTS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
