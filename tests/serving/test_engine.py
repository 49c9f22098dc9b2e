"""Streaming engine tests: chunked-vs-offline parity and lane lifecycle.

The fused streaming tick (features -> encoder step -> greedy step) must
reproduce the offline pipeline (LogMelFrontend + full encode + batched
greedy) exactly: same mel math, same state threading, same argmax decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.decoding.greedy import GreedyDecoder
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.ops.features import stack_subsample_frames
from caiman_asr_tpu.ops.logmel import LogMelConfig, LogMelFrontend, normalize_batch
from caiman_asr_tpu.serving.engine import StreamingEngine

N_CLASSES = 12
BLANK = N_CLASSES - 1


class Tok:
    def detokenize(self, ids):
        return "".join(chr(97 + i) for i in ids)

    def id_to_piece(self, i):
        return chr(97 + i)


@pytest.fixture(scope="module")
def setup():
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    mel_stats = (
        rng.normal(size=80).astype(np.float32) * 0.1 - 8.0,
        np.abs(rng.normal(size=80)).astype(np.float32) + 0.5,
    )
    return model, params, mel_stats


def offline_feats(audio, mel_stats):
    cfg = LogMelConfig(dither=0.0)
    fe = LogMelFrontend(cfg)
    lens = np.asarray([len(audio)], np.int32)
    feats, frame_lens = fe(audio[None, :], lens)
    feats = normalize_batch(
        feats, frame_lens, jnp.asarray(mel_stats[0]), jnp.asarray(mel_stats[1]),
        dataset_to_utt_ratio=1.0,
    )
    feats, frame_lens = stack_subsample_frames(feats, frame_lens, 3, 3)
    return jnp.moveaxis(feats, 2, 0), frame_lens  # [T, 1, 240]


@pytest.mark.slow
def test_streaming_matches_offline(setup):
    model, params, mel_stats = setup
    rng = np.random.default_rng(7)
    n_ticks = 5
    # real audio lives on the int16 grid (FLAC/pcm16); snap so the engine's
    # int16 staging is bit-exact against the float offline path
    audio = (rng.normal(size=960 * n_ticks) * 0.1).astype(np.float32)
    audio = (np.rint(audio * 32768.0) / 32768.0).astype(np.float32)

    # ---- offline reference decode
    feats, frame_lens = offline_feats(audio, mel_stats)
    dec = GreedyDecoder(model, BLANK, max_symbols_per_step=4)
    encs, enc_lens, _ = model.encode(params, feats, jnp.asarray(frame_lens))
    toks, ts, lps, counts = dec.decode_encs(params, encs, enc_lens)
    offline_tokens = [int(t) for t in toks[0, : counts[0]]]

    # ---- streaming decode, 60 ms at a time
    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=4,
        max_symbols_per_step=4,
        native_serializer=False)
    lane = eng.open_stream()
    streamed = []
    for i in range(n_ticks):
        eng.push_audio(lane, audio[i * 960 : (i + 1) * 960])
        out = eng.tick()
        if lane in out and "alternatives" in out[lane]:
            streamed.append(out[lane]["alternatives"][0]["transcript"])
    eng.close_stream(lane)
    out = eng.tick()
    assert out.get(lane, {}).get("eos")

    streamed_text = "".join(streamed)
    offline_text = Tok().detokenize(offline_tokens)
    assert streamed_text == offline_text
    assert len(offline_tokens) > 0  # decode actually emitted something


def test_lane_lifecycle(setup):
    model, params, mel_stats = setup
    eng = StreamingEngine(model, params, BLANK, Tok(), mel_stats=mel_stats,
                          max_streams=2, native_serializer=False)
    a = eng.open_stream()
    b = eng.open_stream()
    assert eng.open_stream() is None  # full
    eng.close_stream(a)
    out = eng.tick()
    assert out[a]["eos"]
    c = eng.open_stream()
    assert c == a  # lane recycled
    # lane b untouched by a's close
    eng.push_audio(b, np.zeros(960, np.float32))
    eng.tick()
    eng.close_stream(b)
    eng.close_stream(c)
    while eng.streams:
        eng.tick()


@pytest.mark.slow
def test_fresh_lane_state_isolated(setup):
    """A recycled lane must not inherit the previous stream's state."""
    model, params, mel_stats = setup
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=960 * 3) * 0.1).astype(np.float32)
    audio = (np.rint(audio * 32768.0) / 32768.0).astype(np.float32)

    def run_alone():
        eng = StreamingEngine(model, params, BLANK, Tok(), mel_stats=mel_stats,
                              max_streams=2, native_serializer=False)
        lane = eng.open_stream()
        texts = []
        for i in range(3):
            eng.push_audio(lane, audio[i * 960 : (i + 1) * 960])
            out = eng.tick()
            if lane in out and "alternatives" in out[lane]:
                texts.append(out[lane]["alternatives"][0]["transcript"])
        return "".join(texts)

    ref = run_alone()

    eng = StreamingEngine(model, params, BLANK, Tok(), mel_stats=mel_stats,
                          max_streams=2, native_serializer=False)
    first = eng.open_stream()
    eng.push_audio(first, (rng.normal(size=960 * 2)).astype(np.float32))
    eng.tick()
    eng.tick()
    eng.close_stream(first)
    eng.tick()
    # occupy the other lane so the recycled lane must be reused
    other = eng.open_stream()
    lane = eng.open_stream()
    assert first in (other, lane)
    texts = []
    for i in range(3):
        eng.push_audio(lane, audio[i * 960 : (i + 1) * 960])
        out = eng.tick()
        if lane in out and "alternatives" in out[lane]:
            texts.append(out[lane]["alternatives"][0]["transcript"])
    assert "".join(texts) == ref


def test_dropped_engine_is_gc_reclaimable(setup):
    """A pipelined engine dropped WITHOUT close() must still be garbage
    collectable: the fetcher thread holds only the queue (not the engine),
    and a gc finalizer posts the shutdown sentinel so the thread exits.
    Regression: a bound-method thread target pinned the engine (params
    never freed, native global-state slots never reclaimable)."""
    import gc
    import weakref

    model, params, mel_stats = setup
    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=2,
        pipeline_depth=2, native_serializer=False,
    )
    thread = eng._fetch_thread
    assert thread is not None and thread.is_alive()
    ref = weakref.ref(eng)
    del eng
    gc.collect()
    assert ref() is None, "dropped engine still reachable (thread pins it?)"
    thread.join(timeout=10)
    assert not thread.is_alive(), "fetcher thread did not exit after gc"


def test_poll_drains_pipelined_responses_early(setup):
    """engine.poll() must deliver a pipelined tick's responses as soon as
    the device->host fetch completes, WITHOUT another tick — and the
    tick+poll response stream must equal the unpipelined (depth=0) run's.
    This is the server's low-latency drain path (serving/server.py ticker:
    tick, then poll each wake)."""
    import time

    model, params, mel_stats = setup
    rng = np.random.default_rng(11)
    n_ticks = 4
    audio = (rng.normal(size=960 * n_ticks) * 0.1).astype(np.float32)
    audio = (np.rint(audio * 32768.0) / 32768.0).astype(np.float32)

    def run(depth, use_poll):
        eng = StreamingEngine(
            model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=2,
            max_symbols_per_step=4, pipeline_depth=depth,
            native_serializer=False)
        lane = eng.open_stream()
        texts = []

        def take(out):
            if lane in out and "alternatives" in out[lane]:
                texts.append(out[lane]["alternatives"][0]["transcript"])

        for i in range(n_ticks):
            eng.push_audio(lane, audio[i * 960 : (i + 1) * 960])
            take(eng.tick())
            if use_poll:
                # the fetch completes asynchronously; poll until it drains
                deadline = time.time() + 10.0
                while time.time() < deadline:
                    out = eng.poll()
                    if out:
                        take(out)
                        break
                    time.sleep(0.002)
        eng.close()
        return "".join(texts)

    ref = run(0, use_poll=False)
    assert ref  # the decode emits something
    assert run(2, use_poll=True) == ref
    # idle poll is a harmless no-op
    eng = StreamingEngine(model, params, BLANK, Tok(), mel_stats=mel_stats,
                          max_streams=2, native_serializer=False)
    assert eng.poll() == {}
    eng.close()


def test_real_tokenizer_piece_table(setup, tmp_path):
    """Engine construction with a REAL Tokenizer (n_classes-1 pieces: blank,
    the last id, has no piece). Regression: the auto native-serializer path
    enumerated range(n_classes) through id_to_piece and raised IndexError at
    server startup with any real SPM model (ref rnnt/model.py derives
    n_classes = vocab+1 the same way)."""
    import json as _json

    from caiman_asr_tpu.data.tokenizer import Tokenizer

    model, params, mel_stats = setup
    pieces = [["<unk>", 0.0, 2]] + [
        [chr(97 + i), -float(i + 1), 1] for i in range(N_CLASSES - 2)
    ]
    assert len(pieces) == N_CLASSES - 1
    tok_path = tmp_path / "tok.json"
    tok_path.write_text(_json.dumps({"pieces": pieces}))
    tok = Tokenizer(labels=["a"], sentpiece_model=tok_path)

    # must not raise (auto mode: native if available, else Python fallback)
    eng = StreamingEngine(model, params, BLANK, tok, mel_stats=mel_stats,
                          max_streams=2)
    eng.close()
