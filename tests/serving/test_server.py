"""End-to-end WebSocket serving test: in-process server + client streaming
(reference: inference/benchmark tests + websocket_api.md contract)."""

import asyncio
import json
import wave

import jax
import numpy as np
import pytest

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.serving.engine import StreamingEngine
from caiman_asr_tpu.serving.server import ASRServer

N_CLASSES = 12
BLANK = N_CLASSES - 1
PORT = 18765


class Tok:
    def detokenize(self, ids):
        return "".join(chr(97 + i) for i in ids)

    def id_to_piece(self, i):
        return chr(97 + i)


@pytest.fixture(scope="module")
def engine():
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    return StreamingEngine(model, params, BLANK, Tok(), max_streams=4, native_serializer=False)


def test_param_validation():
    ok = "/asr/v0.1/stream?content_type=audio/x-raw;format=S16LE;channels=1;rate=16000"
    assert ASRServer.validate_params(ok) is None
    assert ASRServer.validate_params("/asr/v0.1/stream") is not None
    assert ASRServer.validate_params(
        "/asr/v0.1/stream?content_type=audio/mp3"
    ) is not None
    assert ASRServer.validate_params(
        "/asr/v0.1/stream?content_type=audio/x-raw;rate=8000"
    ) is not None
    assert ASRServer.validate_params("/other?content_type=audio/x-raw") is not None


def test_server_end_to_end(engine, tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=16000) * 0.1).astype(np.float32)
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())

    async def scenario():
        from caiman_asr_tpu.inference.transcriber import transcribe_file

        server = ASRServer(engine, tick_interval=0.005)
        import websockets.asyncio.server

        ticker = asyncio.create_task(server._ticker())
        async with websockets.asyncio.server.serve(
            server.handle, "127.0.0.1", PORT,
            subprotocols=["stream.asr.api.myrtle.ai"],
        ):
            result = await asyncio.wait_for(
                transcribe_file(
                    f"ws://127.0.0.1:{PORT}/asr/v0.1/stream", str(wav),
                    realtime=False,
                ),
                timeout=60,
            )
            # bad request is refused
            import websockets.asyncio.client

            with pytest.raises(Exception):
                async with websockets.asyncio.client.connect(
                    f"ws://127.0.0.1:{PORT}/asr/v0.1/stream?content_type=audio/mp3",
                    subprotocols=["stream.asr.api.myrtle.ai"],
                ) as ws:
                    await ws.send(b"\x00\x00")
                    await asyncio.wait_for(ws.recv(), timeout=5)
        ticker.cancel()
        return result

    result = asyncio.run(scenario())
    assert result.duration == pytest.approx(1.0)
    # the untrained model emits plenty of tokens: responses flowed
    assert len(result.responses) > 0
    for tr in result.responses:
        r = tr.response
        assert set(r) >= {"start", "end", "is_provisional", "alternatives"}
        assert r["end"] > r["start"]
    assert len(result.transcript) > 0
    # all lanes were released after EOS
    assert not engine.streams


def test_server_native_serializer_path(tmp_path):
    """The native (C++) serializer path emits pre-serialized JSON strings;
    the server's sender must pass them through verbatim (and not treat them
    as dicts — a previous bug called .get() on them)."""
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    eng = StreamingEngine(
        model, params, BLANK, Tok(), max_streams=2, native_serializer=True
    )
    assert eng._native_ser is not None
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=16000) * 0.1).astype(np.float32)
    wav = tmp_path / "b.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())

    async def scenario():
        from caiman_asr_tpu.inference.transcriber import transcribe_file

        server = ASRServer(eng, tick_interval=0.005)
        import websockets.asyncio.server

        ticker = asyncio.create_task(server._ticker())
        async with websockets.asyncio.server.serve(
            server.handle, "127.0.0.1", PORT + 1,
            subprotocols=["stream.asr.api.myrtle.ai"],
        ):
            result = await asyncio.wait_for(
                transcribe_file(
                    f"ws://127.0.0.1:{PORT + 1}/asr/v0.1/stream", str(wav),
                    realtime=False,
                ),
                timeout=60,
            )
        ticker.cancel()
        return result

    try:
        result = asyncio.run(scenario())
        assert len(result.responses) > 0
        for tr in result.responses:
            r = tr.response
            assert set(r) >= {"start", "end", "is_provisional", "alternatives"}
        assert not eng.streams
    finally:
        eng.close()


def test_server_with_state_reset_router(tmp_path):
    """ASRServer over StateResetRouter: a stream long enough to cross two
    reset boundaries transcribes end-to-end; user-visible ids are stable
    across the lane handovers and all lanes drain on EOS."""
    from caiman_asr_tpu.serving.state_resets import StateResetRouter

    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    eng = StreamingEngine(
        model, params, BLANK, Tok(), max_streams=3, native_serializer=False
    )
    router = StateResetRouter(
        eng, segment_secs=6 * 0.06, overlap_secs=2 * 0.06
    )
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=960 * 16) * 0.1).astype(np.float32)  # 16 ticks
    wav = tmp_path / "c.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())

    async def scenario():
        from caiman_asr_tpu.inference.transcriber import transcribe_file

        server = ASRServer(router, tick_interval=0.005)
        import websockets.asyncio.server

        ticker = asyncio.create_task(server._ticker())
        async with websockets.asyncio.server.serve(
            server.handle, "127.0.0.1", PORT + 2,
            subprotocols=["stream.asr.api.myrtle.ai"],
        ):
            result = await asyncio.wait_for(
                transcribe_file(
                    f"ws://127.0.0.1:{PORT + 2}/asr/v0.1/stream", str(wav),
                    realtime=False,
                ),
                timeout=60,
            )
        ticker.cancel()
        return result

    result = asyncio.run(scenario())
    assert len(result.responses) > 0
    # timestamps are stream-absolute and monotonically ordered past the
    # first reset boundary (6 ticks = 0.36 s)
    starts = [tr.response["start"] for tr in result.responses]
    assert max(starts) > 6 * 0.06
    assert starts == sorted(starts)
    assert not router.streams and not eng.streams


def test_server_rejects_odd_frames_and_backpressures_floods(engine):
    """Robustness: an odd-length S16LE frame closes 1003 (not a handler
    crash), and a client pushing far ahead of real-time is flow-controlled
    (the server stops reading until the lane drains) rather than
    disconnected or buffered unboundedly — a fast file client still gets
    its full transcription."""

    async def scenario():
        import websockets.asyncio.client
        import websockets.asyncio.server
        from websockets.exceptions import ConnectionClosed

        server = ASRServer(engine, tick_interval=0.005, max_buffer_secs=0.5)
        ticker = asyncio.create_task(server._ticker())
        url = (f"ws://127.0.0.1:{PORT + 1}/asr/v0.1/stream?content_type="
               "audio/x-raw;format=S16LE;channels=1;rate=16000")
        codes = {}
        async with websockets.asyncio.server.serve(
            server.handle, "127.0.0.1", PORT + 1,
            subprotocols=["stream.asr.api.myrtle.ai"],
        ):
            async with websockets.asyncio.client.connect(
                url, subprotocols=["stream.asr.api.myrtle.ai"]
            ) as ws:
                await ws.send(b"\x00\x00\x00")  # 3 bytes: not S16LE
                try:
                    while True:
                        await asyncio.wait_for(ws.recv(), timeout=5)
                except ConnectionClosed as e:
                    codes["odd"] = e.rcvd.code if e.rcvd else None

            # 8 s of audio, unpaced, against a 0.5 s buffer cap: every
            # frame is eventually consumed, the lane's resident buffer
            # stays bounded, and the connection survives to a clean EOS
            async with websockets.asyncio.client.connect(
                url, subprotocols=["stream.asr.api.myrtle.ai"]
            ) as ws:
                max_buffered = 0
                for _ in range(200):  # handler opens the lane asynchronously
                    if engine.streams:
                        break
                    await asyncio.sleep(0.005)
                lane = next(iter(engine.streams))
                for _ in range(134):  # 134 x 960 samples = 8 s
                    await ws.send(b"\x00" * 1920)
                    st = engine.streams.get(lane)
                    if st is not None:
                        max_buffered = max(max_buffered, st.buf_len)
                await ws.send(b"")  # EOS
                got_eos = False
                try:
                    while True:
                        await asyncio.wait_for(ws.recv(), timeout=30)
                except ConnectionClosed as e:
                    got_eos = e.rcvd is None or e.rcvd.code in (1000, 1001)
                codes["flood_survived"] = got_eos
                # cap 0.5 s = 8000 samples (+ one message + check quantum
                # of slack before the guard engages)
                codes["max_buffered"] = max_buffered
        for _ in range(200):
            if not engine.streams:
                break
            await asyncio.sleep(0.01)
        ticker.cancel()
        return codes

    codes = asyncio.run(scenario())
    assert codes["odd"] == 1003
    assert codes["flood_survived"]
    assert codes["max_buffered"] <= 8000 + 16000 + 960
    assert not engine.streams  # lanes released
