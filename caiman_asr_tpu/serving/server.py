"""WebSocket streaming ASR server.

Implements the reference deployment's client contract
(docs/src/inference/websocket_api.md): path ``/asr/v0.1/stream``,
query-encoded ``content_type=audio/x-raw;format=S16LE;channels=1;rate=16000``,
binary frames of raw samples in, zero-length binary = EOS, JSON text frames
out (``{start, end, is_provisional, alternatives: [{transcript,
confidence}]}``), subprotocol ``stream.asr.api.myrtle.ai``.

All connections share ONE StreamingEngine: a single ticker task advances the
whole lane batch every frame interval, so concurrency costs one fused TPU
program per 60 ms regardless of the number of streams.

Run:  python -m caiman_asr_tpu.serving.server --model_config ... \
        --ckpt best.npz --mel_stats stats.npz --port 8765
"""

from __future__ import annotations

import argparse
import asyncio
import json
import urllib.parse
from typing import Dict

import numpy as np

SUBPROTOCOL = "stream.asr.api.myrtle.ai"


class ASRServer:
    def __init__(self, engine, tick_interval: float = 0.02,
                 max_buffer_secs: float = 30.0):
        """max_buffer_secs: when a client has pushed more than this much
        audio beyond what the engine has consumed, the server stops
        reading its socket until the lane drains (TCP backpressure), so a
        flooding client costs bounded host RAM while legitimate
        faster-than-real-time file clients are merely flow-controlled,
        not disconnected."""
        self.engine = engine
        self.tick_interval = tick_interval
        self.max_buffer_secs = max_buffer_secs
        self.queues: Dict[int, asyncio.Queue] = {}
        self._ticker_task = None

    # ------------------------------------------------------------ lifecycle
    async def _ticker(self):
        import traceback

        from caiman_asr_tpu.serving.engine import WireTick

        loop = asyncio.get_event_loop()

        def dispatch(out):
            if isinstance(out, WireTick):
                # wire mode: slice each lane's JSON payload straight
                # out of the C serializer's arena (no dict/str
                # materialisation on the tick path — the sender
                # decodes at write time, off the hot loop)
                for raw, idx in out.segments:
                    mv = memoryview(raw)
                    for lane, off, ln in idx.tolist():
                        q = self.queues.get(lane)
                        if q is not None:
                            q.put_nowait(bytes(mv[off:off + ln]))
                out = out.specials
            for lane, resp in out.items():
                q = self.queues.get(lane)
                if q is not None:
                    for r in resp if isinstance(resp, list) else [resp]:
                        q.put_nowait(r)

        poll = getattr(self.engine, "poll", None)
        while True:
            try:
                if self.engine.streams:
                    dispatch(await loop.run_in_executor(
                        None, self.engine.tick))
                    if poll is not None:
                        # under pipelining (pipeline_depth > 0) a tick's
                        # responses complete a fetch-time after dispatch;
                        # polling each wake ships them then, instead of
                        # holding them for the next full-chunk tick
                        # (cuts response latency by up to one chunk)
                        dispatch(await loop.run_in_executor(None, poll))
            except Exception:
                # A dead ticker would silently hang every stream: log & keep
                # ticking (the engine lock makes tick itself safe).
                traceback.print_exc()
            await asyncio.sleep(self.tick_interval)

    @staticmethod
    def validate_params(path: str) -> str | None:
        """Returns an error string, or None if the request is valid."""
        parsed = urllib.parse.urlparse(path)
        if not parsed.path.endswith("/stream"):
            return f"unknown path {parsed.path}"
        q = urllib.parse.parse_qs(parsed.query)
        ct = q.get("content_type", [""])[0]
        if not ct:
            return "missing content_type"
        parts = ct.split(";")
        if parts[0] != "audio/x-raw":
            return f"unsupported content type {parts[0]}"
        opts = dict(p.split("=", 1) for p in parts[1:] if "=" in p)
        if opts.get("format", "S16LE") != "S16LE":
            return "only S16LE supported"
        if opts.get("rate", "16000") != "16000":
            return "only rate=16000 supported"
        if opts.get("channels", "1") != "1":
            return "only channels=1 supported"
        return None

    # ------------------------------------------------------------- handler
    async def handle(self, websocket):
        path = websocket.request.path
        err = self.validate_params(path)
        if err is not None:
            await websocket.close(code=1008, reason=err)
            return
        lane = self.engine.open_stream()
        if lane is None:
            await websocket.close(code=1013, reason="server at capacity")
            return
        q: asyncio.Queue = asyncio.Queue()
        self.queues[lane] = q

        async def sender():
            while True:
                resp = await q.get()
                # native-serializer responses are pre-serialized JSON strings
                # (bytes in wire mode, decoded here so the client still sees
                # text frames); only the engine's own dict responses can
                # carry the eos flag
                if isinstance(resp, dict) and resp.get("eos"):
                    return
                if isinstance(resp, bytes):
                    resp = resp.decode("utf-8")
                elif not isinstance(resp, str):
                    resp = json.dumps(resp)
                await websocket.send(resp)

        send_task = asyncio.create_task(sender())
        pushed = 0

        def consumed_samples():
            # engine wrappers (state-reset router) may not track per-lane
            # frame counts; the flood guard degrades to off there
            try:
                return self.engine.lane_frames(lane) * self.engine.hop_samples
            except Exception:
                return None

        frame_base = consumed_samples() or 0
        max_ahead = int(self.max_buffer_secs * 16000)
        check_quantum = 16000  # amortize the engine-lock touch to ~1/s of audio
        next_check = check_quantum
        clean_eos = False
        try:
            async for message in websocket:
                if isinstance(message, str):
                    continue  # text frames ignored on input
                if len(message) == 0:
                    self.engine.close_stream(lane)
                    clean_eos = True
                    break
                if len(message) % 2:
                    # S16LE frames must be even-sized; a truncated final
                    # byte would otherwise kill the connection uncleanly
                    await websocket.close(code=1003, reason="odd-length frame")
                    break
                # wire format is pcm16 and the engine stages int16: pass the
                # bytes straight through (no per-message float conversion)
                arr = np.frombuffer(message, dtype="<i2")
                pushed += len(arr)
                self.engine.push_audio(lane, arr)
                if pushed >= next_check:
                    next_check = pushed + check_quantum
                    # backpressure: stop reading until the lane drains to
                    # within the buffer cap (flooding costs bounded RAM;
                    # fast file clients are flow-controlled, not dropped)
                    while True:
                        consumed = consumed_samples()
                        if consumed is None or (
                                pushed - (consumed - frame_base)) <= max_ahead:
                            break
                        await asyncio.sleep(self.tick_interval)
            else:
                self.engine.close_stream(lane)
                clean_eos = True
            if clean_eos:
                # drain the EOS flush; error paths skip straight to cleanup
                await send_task
        finally:
            send_task.cancel()
            self.queues.pop(lane, None)
            if lane in self.engine.streams:
                self.engine.close_stream(lane)
            await websocket.close()

    async def serve(self, host: str, port: int):
        import websockets.asyncio.server

        self._ticker_task = asyncio.create_task(self._ticker())
        async with websockets.asyncio.server.serve(
            self.handle, host, port, subprotocols=[SUBPROTOCOL], max_size=2**24
        ):
            await asyncio.Future()


def build_engine(args):
    import jax

    from caiman_asr_tpu.export.checkpointer import apply_params, load_checkpoint
    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.serving.engine import StreamingEngine
    from caiman_asr_tpu.setup.builders import (
        build_model,
        build_tokenizer,
        load_mel_stats,
    )

    bundle = load_config(args.model_config)
    cfg = bundle.cfg
    tokenizer = build_tokenizer(cfg, args.tokenizer_model)
    model, blank_idx = build_model(cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    if args.serving_bundle:
        from caiman_asr_tpu.export.serving_bundle import load_serving_bundle

        weights, extras, meta = load_serving_bundle(args.serving_bundle)
        params = apply_params(params, weights)
        mel_stats = (
            (np.asarray(extras["melmeans"]), np.sqrt(np.asarray(extras["melvars"])))
            if "melmeans" in extras
            else None
        )
    else:
        if args.ckpt:
            loaded, ema, _, _ = load_checkpoint(args.ckpt)
            params = apply_params(params, ema if ema is not None else loaded)
        mel_stats = load_mel_stats(args.mel_stats_path)

    # n-gram shallow fusion in the served beam: an ARPA model (CLI path, or
    # the bytes embedded in the serving bundle) compiled into the dense
    # device automaton the jitted beam fuses per expansion
    tables, alpha = None, 0.0
    tmp_arpa = None
    if getattr(args, "decoder", "greedy") == "beam":
        ngram_path = getattr(args, "ngram_path", None)
        scale = getattr(args, "ngram_scale_factor", None)
        if ngram_path is None and args.serving_bundle and "ngram" in extras:
            import tempfile

            tmp = tempfile.NamedTemporaryFile(
                suffix=".arpa", delete=False
            )
            tmp.write(np.asarray(extras["ngram"], np.uint8).tobytes())
            tmp.close()
            ngram_path = tmp_arpa = tmp.name
            if scale is None and "ngram_scale" in extras:
                scale = float(extras["ngram_scale"])
        if ngram_path:
            from caiman_asr_tpu.lm.device_table import build_device_tables
            from caiman_asr_tpu.lm.ngram import NGramLM

            alpha = float(scale if scale is not None else cfg.ngram.scale_factor)
            if alpha > 0.0:
                lm = NGramLM.load(ngram_path)
                if tmp_arpa is not None:
                    import os

                    os.unlink(tmp_arpa)

                def piece(i):
                    try:
                        return tokenizer.id_to_piece(i)
                    except (IndexError, KeyError):
                        return ""
                tables = build_device_tables(
                    lm,
                    [piece(i) for i in range(model.n_classes)],
                    skip_ids=[blank_idx],
                )
                print(
                    f"n-gram fusion on: {tables.n_states} states, "
                    f"alpha={alpha}", flush=True,
                )
    # keyword boosting in the served beam: the trie compiled into the dense
    # device automaton the jitted beam boosts per expansion
    # (keywords/device_table.py; ref rnnt/beam.py:614-627)
    kw_tables = None
    if getattr(args, "decoder", "greedy") == "beam" and getattr(
        args, "keyword_boost_path", None
    ):
        from caiman_asr_tpu.keywords.device_table import build_keyword_tables
        from caiman_asr_tpu.keywords.process import load_keywords

        def kw_piece(i):
            try:
                return tokenizer.id_to_piece(i)
            except (IndexError, KeyError):
                return ""

        kw_tables = build_keyword_tables(
            load_keywords(args.keyword_boost_path),
            [kw_piece(i) for i in range(model.n_classes)],
            skip_ids=[blank_idx],
        )
        print(
            f"keyword boosting on: {kw_tables.n_states} states", flush=True
        )
    fe_secs = float(getattr(args, "beam_final_emission_thresh", float("inf")))
    # engine tick duration from the featurizer config (60 ms canonical;
    # matches StreamingEngine.frame_seconds = stacking x stack_time x hop)
    frame_secs = (
        cfg.input_val.logmel.window_stride
        * cfg.input_val.splicing.frame_stacking
        * model.cfg.enc_stack_time_factor
    )
    engine_kw = dict(
        mel_stats=mel_stats,
        decoder=getattr(args, "decoder", "greedy"),
        beam_width=getattr(args, "beam_width", 4),
        # <0 disables a threshold (host-beam CLI convention)
        beam_score_thresh=(
            None if (st := getattr(args, "beam_prune_score_thresh", None))
            is None or st < 0 else st
        ),
        beam_topk_thresh=(
            None if (tt := getattr(args, "beam_prune_topk_thresh", None))
            is None or tt < 0 else tt
        ),
        # CLI threshold is seconds (ref final_emission_thresh); the device
        # beam counts engine ticks
        beam_final_emission_frames=(
            max(1, round(fe_secs / frame_secs))
            if np.isfinite(fe_secs) else None
        ),
        logmel=cfg.input_val.logmel,
        frame_stacking=cfg.input_val.splicing.frame_stacking,
        frame_subsampling=cfg.input_val.splicing.frame_subsampling,
        pipeline_depth=getattr(args, "pipeline_depth", 1),
        ngram_lm=tables,
        ngram_alpha=alpha if tables is not None else 0.0,
        keywords=kw_tables,
        wire_responses=getattr(args, "wire_responses", False),
    )
    num_chips = getattr(args, "num_chips", 1) or 1
    if num_chips > 1:
        from caiman_asr_tpu.serving.multi_chip import MultiChipEngine

        devices = jax.local_devices()
        if len(devices) < num_chips:
            raise SystemExit(
                f"--num_chips {num_chips} but only {len(devices)} devices "
                "visible"
            )
        return MultiChipEngine(
            model, params, blank_idx, tokenizer,
            devices=devices[:num_chips],
            max_streams_per_chip=args.max_streams,
            **engine_kw,
        )
    return StreamingEngine(
        model, params, blank_idx, tokenizer,
        max_streams=args.max_streams, **engine_kw,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="streaming ASR WebSocket server")
    p.add_argument("--model_config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--serving_bundle", default=None)
    p.add_argument("--tokenizer_model", default=None)
    p.add_argument("--mel_stats_path", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max_streams", type=int, default=64,
                   help="lane capacity per chip")
    p.add_argument("--num_chips", type=int, default=1,
                   help="serve over the first N local devices: one pinned "
                        "engine per chip, lanes routed to the least-loaded "
                        "chip (linear capacity scale-out)")
    p.add_argument("--decoder", default="greedy", choices=["greedy", "beam"])
    p.add_argument("--beam_width", type=int, default=4)
    p.add_argument("--beam_prune_score_thresh", type=float, default=0.4,
                   help="kill hypotheses whose normalised score trails the "
                        "beam best by more (ref beam.py:364-366); <0 = off")
    p.add_argument("--beam_prune_topk_thresh", type=float, default=1.5,
                   help="mask expansion candidates more than this below the "
                        "frame's best acoustic log-prob (ref beam.py:295); "
                        "<0 = off")
    p.add_argument("--beam_final_emission_thresh", type=float,
                   default=float("inf"),
                   help="seconds a final may lag before the beam prunes the "
                        "blocking divergence (ref beam.py:238-243)")
    p.add_argument("--ngram_path", default=None,
                   help="ARPA n-gram for device shallow fusion in beam mode "
                        "(defaults to the serving bundle's embedded model)")
    p.add_argument("--ngram_scale_factor", type=float, default=None)
    p.add_argument("--keyword_boost_path", default=None,
                   help="keyword JSON for boosting in beam mode (reference "
                        "--keyword_boost_path): the trie is compiled into a "
                        "dense device automaton fused in the jitted beam")
    p.add_argument("--pipeline_depth", type=int, default=1,
                   help="in-flight ticks before host consumption; each unit "
                        "hides one tick of device->host latency and adds one "
                        "chunk (60 ms) of response latency")
    p.add_argument("--sr_segment", type=float, default=0.0,
                   help="serving state resets: refresh model state every N "
                        "seconds per stream via shadow-lane handover "
                        "(reference --sr_segment; 0 = off)")
    p.add_argument("--sr_overlap", type=float, default=3.0,
                   help="warmup context seconds for each state reset "
                        "(reference --sr_overlap)")
    p.add_argument("--wire_responses", action="store_true",
                   help="keep native-serializer responses as one JSON bytes "
                        "arena per tick instead of per-lane Python strings "
                        "(the per-response string materialisation dominates "
                        "host tick time past ~4k lanes)")
    p.add_argument("--max_buffer_secs", type=float, default=30.0,
                   help="stop reading a client's socket (TCP backpressure) "
                        "while it is more than this many seconds of audio "
                        "ahead of the engine, bounding host RAM per stream")
    args = p.parse_args(argv)
    engine = build_engine(args)
    engine.warmup()
    if args.sr_segment > 0:
        from caiman_asr_tpu.serving.state_resets import StateResetRouter

        engine = StateResetRouter(
            engine, segment_secs=args.sr_segment,
            overlap_secs=args.sr_overlap,
        )
    server = ASRServer(engine, max_buffer_secs=args.max_buffer_secs)
    chips = getattr(engine, "n_chips", 1)
    print(f"serving on ws://{args.host}:{args.port}/asr/v0.1/stream "
          f"({engine.B} lanes over {chips} chip{'s' if chips > 1 else ''})",
          flush=True)
    asyncio.run(server.serve(args.host, args.port))


if __name__ == "__main__":
    main()
