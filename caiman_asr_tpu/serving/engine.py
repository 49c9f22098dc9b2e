"""Batched streaming inference engine (the serving hot path).

The reference deploys to an FPGA server (closed source); its behavioural
contract is the WebSocket response schema + per-frame streaming decode
(docs/src/inference/websocket_api.md, SURVEY §3.3). TPU-native equivalent:
ONE jitted chunk step, fused end-to-end —

  raw 60 ms audio chunk [B, 1201 samples]
    -> preemphasis -> matmul-DFT log-mel (6 x 10 ms frames)
    -> dataset-stats normalization -> frame stacking (2 x 30 ms frames)
    -> stateful encoder step (pre_rnn -> StackTime -> post_rnn)
    -> greedy decode step (joint + argmax + pred-net advance)
  -> emitted tokens [B, max_symbols] + advanced streaming state

All lanes advance in lock-step; inactive lanes are masked (state frozen) so
one compiled program serves any mix of streams. Host code only manages lane
allocation, sample buffering, and response serialisation.

Chunk layout: each tick consumes HOP_SAMPLES=960 new samples per lane
(60 ms at 16 kHz) plus a 241-sample carry (240 = window-minus-hop overlap,
matching the reference's initial-padding rule pipeline.py:263-268, +1 for
the pre-emphasis border).
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from caiman_asr_tpu.decoding.greedy import make_streaming_step
from caiman_asr_tpu.models.rnnt import RNNT, _linear
from caiman_asr_tpu.models.state import EncoderState
from caiman_asr_tpu.ops.features import stack_subsample_frames
from caiman_asr_tpu.ops.logmel import LogMelConfig, dft_bases, hann_window, mel_filterbank


@dataclass
class StreamState:
    """Host-side per-lane bookkeeping."""

    # buffered-but-unprocessed audio as a chunk list + length counter:
    # appending is O(chunk) (a growing flat array would re-copy the whole
    # buffer on every websocket frame — the staging loop dominates tick time
    # past ~4k lanes)
    chunks: List[np.ndarray] = field(default_factory=list)
    buf_len: int = 0
    dev_len: int = 0                    # max beam len at last consumed tick
    rebase_pending: bool = False        # a rebase is in flight (beam)
    frame_idx: int = 0                  # decoder frames emitted so far
    closed: bool = False                # EOS received; flush then free
    committed: int = 0                  # beam tokens already shipped as finals
    # best-hypothesis token history (beam only): snapshot of window tokens as
    # they slide past, so finals can ship even if agreement stalls past the
    # device->host window
    hist: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))


def _upload_loop(q, eng_ref):
    """Uploader thread body: for each queued tick, copy the staging slot to
    the device (the slow part on remote transports — runs with NO lock
    held), hand the slot back for reuse, then dispatch the jitted tick and
    chain the engine's device state under the state lock (cheap). Entries:
    (slot, meta, adv) tuples; ``None`` is the shutdown sentinel. Holds only
    the queue and a weakref so a dropped engine is never pinned; each
    iteration re-resolves the engine and exits if it was collected. Upload
    errors are forwarded into the pending entry so the tick thread raises
    them at consume time (the device-state chain is dead either way).
    ``q.task_done()`` is only called AFTER the entry is visible in
    eng._pending, so q.join() == "all dispatched results are consumable"."""
    import queue as _queue

    while True:
        item = q.get()
        if item is None:
            return
        slot, meta, adv = item
        eng = eng_ref()
        if eng is None:
            return
        err = None
        prb = eng._probe
        t0 = time.perf_counter() if prb is not None else 0.0
        try:
            if eng._bench_reuse_upload and eng._upload_cache is not None:
                samples_dev = eng._upload_cache
            else:
                samples_dev = eng._dput(slot)
                if eng._bench_reuse_upload:
                    eng._upload_cache = samples_dev
        except Exception as e:  # pragma: no cover - transport failure
            err = e
        eng._slot_pool.put(slot)
        if prb is not None:
            prb["up_samples"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        ev = threading.Event()
        if err is None:
            try:
                with eng._state_lock:
                    packed, eng._carry, eng.enc_state, eng.dec_state = (
                        eng._jit_tick(
                            eng.params, samples_dev, eng._carry,
                            eng.enc_state, eng.dec_state, eng._init_dec,
                            eng._dput(meta),
                        )
                    )
                try:
                    packed.copy_to_host_async()
                except Exception:
                    pass
            except Exception as e:
                err = e
        if prb is not None:
            prb["up_disp"].append(time.perf_counter() - t0)
        if err is not None:
            ev.set()
            eng._pending.append([err, adv, ev])
            del eng  # drop the ref before blocking on q.get()
            q.task_done()
            continue
        entry = [packed, adv, ev]
        eng._pending.append(entry)
        if eng._fetchq is not None:
            eng._fetchq.put(entry)
        else:  # no fetcher: materialize here so consume never blocks the gil
            try:
                entry[0] = np.asarray(packed)
            except Exception as e:
                entry[0] = e
            ev.set()
        del eng, packed, entry  # drop refs before blocking on q.get()
        q.task_done()


def _fetch_loop(q):
    """Fetcher thread body: materialize packed tick outputs on the host.
    Touches only the queue and the entry it was handed (never the engine —
    deliberately a free function so the thread cannot pin the engine
    alive); _consume waits on the entry's event. ``None`` is the shutdown
    sentinel (posted by close() or the engine's gc finalizer)."""
    while True:
        entry = q.get()
        if entry is None:
            return
        try:
            entry[0] = np.asarray(entry[0])
        except Exception as e:  # surfaced by _consume on the tick thread
            entry[0] = e
        entry[2].set()


@dataclass
class WireTick:
    """One tick's responses in wire form (``wire_responses=True``).

    ``segments``: list of (raw, idx) pairs, one per drained in-flight tick —
    ``raw`` is a contiguous bytes arena of UTF-8 JSON response payloads and
    ``idx`` an int32 [n, 3] array of (lane, payload_offset, payload_len);
    ``raw[off:off+len]`` is exactly the text frame to write to that lane's
    socket. ``specials``: the engine's own dict responses (EOS markers and
    final beam flushes on stream close — rare, Python dicts as in the
    default mode). Wire form exists because materialising one Python string
    per response costs more than deriving the responses themselves at scale
    (measured ~13 ms C arena vs 40-150 ms ``_to_dict`` at B=12288 — the
    round-2 p99 tail was this churn plus the cyclic-GC sweeps it induced,
    not device or transport time)."""

    segments: List[Tuple[bytes, np.ndarray]]
    specials: Dict[int, list]

    def to_dict(self) -> Dict[int, list]:
        """Flatten back to the default-mode {lane: [json_str|dict]} form
        (tests and low-rate callers; defeats the zero-materialisation
        point at scale)."""
        out: Dict[int, list] = {}
        for raw, idx in self.segments:
            for lane, off, ln in idx.tolist():
                out.setdefault(lane, []).append(
                    raw[off : off + ln].decode("utf-8")
                )
        for lane, msgs in self.specials.items():
            out.setdefault(lane, []).extend(msgs)
        return out


class StreamingEngine:
    def __init__(
        self,
        model: RNNT,
        params,
        blank_idx: int,
        tokenizer,
        mel_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        max_streams: int = 64,
        max_symbols_per_step: int = 8,
        decoder: str = "greedy",
        beam_width: int = 4,
        beam_cap: int = 256,
        logmel: LogMelConfig = LogMelConfig(),
        frame_stacking: int = 3,
        frame_subsampling: int = 3,
        dtype=jnp.float32,
        pipeline_depth: int = 0,
        beam_win: int = 64,
        native_serializer: Optional[bool] = None,
        ngram_lm=None,
        ngram_alpha: float = 0.0,
        keywords=None,
        beam_merge: bool = True,
        device=None,
        wire_responses: bool = False,
        beam_score_thresh: Optional[float] = None,
        beam_topk_thresh: Optional[float] = None,
        beam_final_emission_frames: Optional[int] = None,
    ):
        """pipeline_depth: number of in-flight ticks before results are
        consumed on the host. 0 = synchronous (each tick() returns its own
        responses — simplest, used by tests). N>0 = dispatch tick i, start an
        async device->host copy of its packed outputs, and consume tick
        i-N's results — the copy then overlaps N ticks of device work plus
        the real-time idle gap, hiding transfer latency entirely on
        co-located hosts and most of the RTT on tunnelled ones, at the cost
        of N chunks (N*60 ms) of added response latency.

        device: pin this engine to one jax.Device (params, streaming state
        and all per-tick transfers committed there, so the jitted tick runs
        on that chip). None = default placement. One engine per chip is the
        scale-out unit (serving/multi_chip.MultiChipEngine)."""
        self.model = model
        self._device = device
        self.params = self._dput(
            jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        )
        self.blank_idx = blank_idx
        self.tokenizer = tokenizer
        self.B = max_streams
        self.cfg = logmel
        self.stack = frame_stacking
        self.sub = frame_subsampling
        self.dtype = dtype

        hop, win = logmel.hop_length, logmel.win_length
        self.mel_per_tick = frame_stacking * model.cfg.enc_stack_time_factor  # 6
        self.hop_samples = self.mel_per_tick * hop                            # 960
        self.carry_samples = (win - hop) + 1                                  # 241
        self.frame_seconds = self.hop_samples / logmel.sample_rate            # 0.06

        cos_b, sin_b = dft_bases(logmel.n_fft, win)
        w = hann_window(win)[:, None]
        self._cos = self._dput(jnp.asarray(cos_b * w, dtype))
        self._sin = self._dput(jnp.asarray(sin_b * w, dtype))
        self._fb = self._dput(jnp.asarray(
            mel_filterbank(logmel.sample_rate, logmel.n_fft, logmel.n_mels), dtype
        ))
        if mel_stats is not None:
            self._mean = self._dput(jnp.asarray(mel_stats[0], dtype))
            self._std = self._dput(jnp.asarray(mel_stats[1], dtype))
        else:
            self._mean = self._dput(jnp.zeros((logmel.n_mels,), dtype))
            self._std = self._dput(jnp.ones((logmel.n_mels,), dtype))

        self.decoder = decoder
        self.beam_width = beam_width
        if decoder == "beam":
            from caiman_asr_tpu.decoding.fast_beam import make_streaming_beam_step

            self._init_beam, self._beam_step = make_streaming_beam_step(
                model, blank_idx, beam_width=beam_width,
                expansions=min(max_symbols_per_step, 8), cap=beam_cap,
                ngram_lm=ngram_lm, ngram_alpha=ngram_alpha,
                keywords=keywords, merge=beam_merge,
                score_thresh=beam_score_thresh,
                topk_thresh=beam_topk_thresh,
                final_emission_frames=beam_final_emission_frames,
            )
            # device->host token window per tick: newest _beam_win positions
            # of every hypothesis. Must exceed per-tick growth (expansions)
            # by a comfortable agreement margin, and be <= cap. Rounded to
            # even so the int16 token pairs pack cleanly into int32 lanes.
            self._beam_win = max(2, min(beam_win, beam_cap) // 2 * 2)
            self._beam_cap = beam_cap
            self._beam_expansions = min(max_symbols_per_step, 8)
        else:
            self._decode_step = make_streaming_step(
                model, blank_idx, max_symbols_per_step=max_symbols_per_step
            )
        # Native (C++) response serializer: owns the per-lane commit state
        # and emits wire-ready JSON strings (~0.5 us/lane vs ~25 us/lane for
        # the Python path — the co-located host-path ceiling at scale).
        # Auto-enabled when the tokenizer exposes piece strings (or is None:
        # empty transcripts, as in benches); False forces the Python path.
        self._native_ser = None
        if native_serializer is not False:
            pieces = None
            if tokenizer is None:
                pieces = [""] * model.n_classes
            elif hasattr(tokenizer, "id_to_piece"):
                # real tokenizers carry n_classes-1 pieces (blank, the last
                # id, never serialises); benches' synthetic tokenizers may
                # carry all n_classes — map anything past the table to ""
                def _piece(i):
                    try:
                        return tokenizer.id_to_piece(i)
                    except (IndexError, KeyError):
                        return ""

                pieces = [_piece(i) for i in range(model.n_classes)]
            if pieces is not None:
                try:
                    from caiman_asr_tpu.native import ResponseSerializer

                    self._native_ser = ResponseSerializer(
                        self.B,
                        beam_width if decoder == "beam" else 1,
                        self._beam_win if decoder == "beam" else 1,
                        self.frame_seconds,
                        pieces,
                    )
                except Exception as e:
                    if native_serializer:
                        raise
                    import warnings

                    warnings.warn(
                        f"native serializer unavailable ({e}); "
                        "using the Python response path"
                    )
            elif native_serializer:
                raise ValueError(
                    "native_serializer requires a tokenizer with id_to_piece"
                )
        # Native audio staging (per-lane buffers + staging fill in C);
        # independent of the serializer — needs no tokenizer.
        self._native_stg = None
        if native_serializer is not False:
            try:
                from caiman_asr_tpu.native import AudioStaging

                # carry_len=0: the carry is DEVICE state (self._carry below),
                # so staging only assembles the hop samples — 20% less
                # host->device upload per tick and no host carry memcpy
                self._native_stg = AudioStaging(self.B, 0, self.hop_samples)
                self._active = np.zeros(self.B, np.uint8)
                self._closed = np.zeros(self.B, np.uint8)
            except Exception as e:
                if native_serializer:
                    raise
                import warnings

                warnings.warn(
                    f"native audio staging unavailable ({e}); "
                    "using the Python staging path"
                )
        # Wire-response mode: tick() returns a WireTick (JSON bytes arena +
        # (lane, off, len) index) instead of {lane: str} — skips the
        # one-Python-string-per-response materialisation, which dominates
        # host tick time past ~4k lanes (see WireTick docstring).
        self._wire = bool(wire_responses)
        if self._wire and self._native_ser is None:
            raise ValueError(
                "wire_responses=True requires the native serializer "
                "(a tokenizer with id_to_piece, or tokenizer=None)"
            )
        # args: (params, samples_new[B,hop] i16, carry[B,carry] i16,
        #        enc_state, dec_state, init_dec, meta[3B+1])
        self._jit_tick = jax.jit(self._tick_impl, donate_argnums=(2, 3, 4))
        self._tick_count = 0
        self._rng0 = jax.random.PRNGKey(4242)
        self.pipeline_depth = pipeline_depth
        from collections import deque

        # entries: [packed (device array or fetched np array), adv, event]
        # single-producer (tick thread or uploader) / single-consumer (tick
        # thread) deque: CPython append/popleft are atomic, no lock needed
        self._pending = deque()
        # Pipelined mode gets a fetcher thread: the device->host result copy
        # (a full transport round trip on remote TPUs, ~30 ms) runs off the
        # tick loop and overlaps the next ticks' staging + upload. tick()
        # consumes whatever the fetcher has finished, oldest first.
        self._fetchq = None
        self._fetch_thread = None
        if pipeline_depth > 0:
            import queue
            import weakref

            self._fetchq = queue.Queue()
            # The thread must NOT hold a reference to the engine (a bound
            # method would): an engine dropped without close() would stay
            # pinned forever by the blocked queue.get() — params never
            # freed, and the native serializer/staging finalizers could
            # never run. The loop only needs the queue; a finalizer posts
            # the shutdown sentinel when the engine is garbage collected.
            self._fetch_thread = threading.Thread(
                target=_fetch_loop, args=(self._fetchq,), daemon=True
            )
            self._fetch_thread.start()
            weakref.finalize(self, self._fetchq.put, None)

        self.enc_state = self._dput(self._zero_enc_state())
        self.dec_state = self._dput(self._zero_dec_state())
        self._init_dec = self._dput(jax.tree.map(jnp.copy, self.dec_state))
        self._carry = self._dput(
            jnp.zeros((self.B, self.carry_samples), jnp.int16)
        )
        self.streams: Dict[int, StreamState] = {}
        self._free = list(range(self.B))
        # lanes whose device state must be zeroed at the next dispatch (the
        # reset rides the tick's meta vector — no per-open scatter dispatch)
        self._pending_resets: set = set()
        # The server ticks from an executor thread while connection handlers
        # open/close/push from the event loop — serialize engine access.
        self._lock = threading.RLock()
        # Guards the device-state chain (enc/dec/carry + dispatch order).
        # Never acquired while waiting on a queue: the uploader takes it
        # only around the (cheap) dispatch, the tick thread only when it
        # dispatches inline or reads dec_state for a final flush.
        self._state_lock = threading.Lock()
        # Input-side pipeline: the host->device upload of the staging matrix
        # is the long pole on remote transports (and non-trivial on PCIe at
        # 16k lanes). With pipeline_depth > 0, tick() fills one of two
        # staging slots and hands it to an uploader thread; the upload of
        # tick N+1 then overlaps tick N's device work + response drain, so
        # steady-state tick wall time is max(upload, device, host) instead
        # of the sum. Slot hand-back (after jnp.asarray copies the bytes)
        # uses a queue as the backpressure token — never while holding the
        # engine lock, so tick-blocked-on-slot cannot deadlock the uploader.
        self._upq = None
        self._up_thread = None
        self._slot_pool = None
        # Benchmark-only: when True the uploader reuses one cached device
        # buffer instead of shipping the staging slot, so the full engine
        # loop can be timed with the WAN transport (not a product cost)
        # elided. Never set in serving paths.
        self._bench_reuse_upload = False
        self._upload_cache = None
        # Benchmark-only per-tick phase recorder (scripts/probe_tail_phases):
        # when set to a dict of lists, tick()/uploader record wall time per
        # phase so tail (p99) ticks can be attributed. None in serving paths
        # (a single `is not None` check per phase otherwise).
        self._probe = None
        if pipeline_depth > 0:
            import queue as _queue

            self._upq = _queue.Queue()
            self._slot_pool = _queue.Queue()
            for _ in range(2):
                self._slot_pool.put(
                    np.zeros((self.B, self.hop_samples), np.int16)
                )
            # free function + weakref: a bound method would pin a dropped
            # engine forever (same reasoning as the fetcher thread above)
            self._up_thread = threading.Thread(
                target=_upload_loop, args=(self._upq, weakref.ref(self)),
                daemon=True,
            )
            self._up_thread.start()
            weakref.finalize(self, self._upq.put, None)

    def _dput(self, x):
        """Commit an array/pytree to this engine's device (no-op placement
        when unpinned). Every host->device copy goes through here so a
        pinned engine's jitted tick always executes on its own chip."""
        return jax.device_put(x, self._device)

    def close(self):
        """Release native resources (serializer/staging C state) and stop
        the fetcher/uploader threads."""
        if self._upq is not None:
            self._upq.put(None)
            self._up_thread.join(timeout=30)
            self._upq = None
            self._up_thread = None
        if self._fetchq is not None:
            self._fetchq.put(None)
            self._fetch_thread.join(timeout=10)
            self._fetchq = None
            self._fetch_thread = None
        if self._native_ser is not None:
            self._native_ser.close()
            self._native_ser = None
        if self._native_stg is not None:
            self._native_stg.close()
            self._native_stg = None

    def warmup(self):
        """Force-compile the tick program before serving traffic (first-tick
        JIT latency would otherwise hit the first streams)."""
        samples = self._dput(jnp.zeros((self.B, self.hop_samples), jnp.int16))
        # two passes: the second absorbs the weak-type-settling retrace so
        # live traffic never pays a compile
        with self._state_lock:
            for i in range(2):
                meta = np.zeros(3 * self.B + 1, np.int32)
                meta[-1] = i
                out, self._carry, self.enc_state, self.dec_state = (
                    self._jit_tick(
                        self.params, samples, self._carry, self.enc_state,
                        self.dec_state, self._init_dec, self._dput(meta),
                    )
                )
        _ = np.asarray(out)  # real barrier (block_until_ready is dispatch-only
        # over tunnelled backends)

    # --------------------------------------------------------- device step
    def _zero_enc_state(self) -> EncoderState:
        c = self.model.cfg

        def hc(layers, hid):
            return (
                jnp.zeros((layers, self.B, hid), self.dtype),
                jnp.zeros((layers, self.B, hid), self.dtype),
            )

        return EncoderState(
            pre_rnn=hc(c.enc_pre_rnn_layers, c.enc_n_hid),
            post_rnn=hc(c.enc_post_rnn_layers, c.enc_n_hid),
        )

    def _zero_dec_state(self):
        if self.decoder == "beam":
            return self._init_beam(self.params, self.B, self.dtype)
        c = self.model.cfg
        h = jnp.zeros((c.pred_rnn_layers, self.B, c.pred_n_hid), self.dtype)
        cc = jnp.zeros_like(h)
        from caiman_asr_tpu.ops.lstm import lstm_step

        emb = jnp.zeros((self.B, c.pred_n_hid), self.dtype)
        y, h, cc = lstm_step(
            self.params["prediction"]["dec_rnn"], emb, h, cc,
            hard=c.hard_activations, quantize=c.quantize,
        )
        g = _linear(self.params["joint_pred"], y)
        return (g, h, cc)

    def _tick_impl(self, params, samples_new, carry, enc_state, dec_state,
                   init_dec, meta):
        """samples_new: [B, hop] int16 PCM — ONLY the fresh 60 ms; the
        241-sample window/preemph overlap (``carry``) is device state,
        prepended here and re-extracted from the tail, so it never crosses
        host->device (20% of the per-tick upload). meta: [3B+1] int32
        packing ``[adv(B), rebase(B), reset(B), tick_count]`` — one upload
        instead of several (each small host->device put pays a full round
        trip on remote transports), and the dither key folds from
        ``tick_count`` inside the program (saves a separate fold_in dispatch
        per tick). int16 is the wire format (websocket_api.md) and halves
        the per-tick host->device upload; the scale to [-1, 1) fuses into
        the featurizer here for free.

        reset: lanes freshly (re)opened since the last dispatch — their
        carry/enc/dec state is zeroed (dec: restored to ``init_dec``) BEFORE
        this tick computes, replacing per-open host-side scatter dispatches
        (which would also race the uploader thread's donated state chain).

        rebase (beam only): [B] int32 — drop this many already-committed
        token positions from the front of each lane's beam buffers before
        stepping (the host only ever re-reads tokens it has NOT committed,
        so shifting them out makes the `cap`-slot buffer a ring over the
        committed horizon instead of a hard stream-length limit). The
        applied value is echoed in the packed output so pipelined host
        bookkeeping shifts coordinates at exactly the right tick."""
        cfg = self.cfg
        B = samples_new.shape[0]
        adv = meta[:B].astype(bool)
        rebase = meta[B : 2 * B]
        reset = meta[2 * B : 3 * B].astype(bool)
        rng = jax.random.fold_in(self._rng0, meta[3 * B])
        # zero freshly-opened lanes before compute (they may advance this
        # very tick); keep = ~reset selects the CURRENT state on live lanes
        keep = ~reset
        carry = jnp.where(reset[:, None], jnp.int16(0), carry)
        enc_state = _gate_state(
            enc_state, jax.tree.map(jnp.zeros_like, enc_state), keep
        )
        dec_state = _gate_state(dec_state, init_dec, keep)
        samples = jnp.concatenate([carry, samples_new], axis=1)
        new_carry = samples[:, -self.carry_samples :]
        samples = (samples.astype(jnp.float32) * (1.0 / 32768.0)).astype(
            self.dtype
        )
        if cfg.dither != 0.0:
            # The model is trained/validated with dithered features; without
            # it, digital-silence frames sit ~30 log-mel units below anything
            # seen in training and suppress emissions.
            samples = samples + cfg.dither * jax.random.normal(
                rng, samples.shape, samples.dtype
            )
        # preemphasis over the carried window
        pre = samples[:, 1:] - cfg.preemph * samples[:, :-1]  # [B, 1200]
        idx = (
            jnp.arange(self.mel_per_tick)[:, None] * cfg.hop_length
            + jnp.arange(cfg.win_length)[None, :]
        )
        frames = pre[:, idx]  # [B, 6, win]
        re = jnp.einsum("btw,wk->btk", frames, self._cos)
        im = jnp.einsum("btw,wk->btk", frames, self._sin)
        mel = jnp.einsum("btk,km->btm", re * re + im * im, self._fb)
        logmel = jnp.log(jnp.maximum(mel, 1e-20))
        norm = (logmel - self._mean[None, None, :]) / (self._std[None, None, :] + 1e-9)
        # stack 3 / subsample 3: [B, n_mels, 6] -> [B, 240, 2]
        feats, _ = stack_subsample_frames(
            jnp.moveaxis(norm, 1, 2),
            jnp.full((samples.shape[0],), self.mel_per_tick, jnp.int32),
            self.stack,
            self.sub,
        )
        x = jnp.moveaxis(feats, 2, 0).astype(self.dtype)  # [2, B, 240]

        lens = jnp.full((samples.shape[0],), x.shape[0], jnp.int32)
        f, _, new_enc_state = self.model.encode(params, x, lens, enc_state)
        if self.decoder == "beam":
            # drop `rebase` committed positions from the front of the lane's
            # buffers (per-lane roll; wrapped tail is beyond `lens`, never
            # read). lax.cond skips the rolls on the common no-rebase tick.
            def _apply_rebase(ds):
                out = dict(
                    ds,
                    toks=_roll_left(ds["toks"], rebase, 2),
                    ts=_roll_left(ds["ts"], rebase, 2),
                    lens=jnp.maximum(ds["lens"] - rebase[:, None], 0),
                )
                if "committed" in ds:
                    # the final-emission watermark counts buffer positions;
                    # shift it with the window
                    out["committed"] = jnp.maximum(
                        ds["committed"] - rebase, 0
                    )
                return out

            dec_state = lax.cond(
                jnp.any(rebase > 0), _apply_rebase, lambda ds: ds, dec_state
            )
            new_dec_state = self._beam_step(params, f[:, 0], dec_state)
            # host transfer stays O(win) per lane: a sliding window of the
            # newest tokens (full [B, W, cap] buffers would dominate tick
            # time at scale)
            win = self._beam_win
            lens = new_dec_state["lens"]
            base = jnp.maximum(jnp.max(lens, axis=1) - win, 0)  # [B]
            toks = _roll_left(new_dec_state["toks"], base, 2)[:, :, :win]
            n = (lens, base, new_dec_state["scores"])
        else:
            toks, n, new_dec_state = self._decode_step(params, f[:, 0], dec_state)

        # freeze state on lanes that did not advance
        new_carry = jnp.where(adv[:, None], new_carry, carry)
        new_enc_state = _gate_state(new_enc_state, enc_state, adv)
        new_dec_state = _gate_state(new_dec_state, dec_state, adv)
        # pack every host-bound output into ONE int32 array: a single
        # device->host transfer per tick (per-array fetches each pay a full
        # round trip on remote transports)
        if self.decoder == "beam":
            lens, base, scores = n
            lens = jnp.where(adv[:, None], lens, 0)
            echo = rebase
            # tokens ship as int16 PAIRS bitcast into int32 lanes (vocab +
            # blank fit int16): halves the dominant W*win section of the
            # per-tick device->host payload — PCIe/HBM traffic co-located,
            # and the difference between fetch-bound and real-time over
            # bandwidth-poor transports. _consume reverses the bitcast.
            t16 = toks.astype(jnp.int16).reshape(B, (self.beam_width * self._beam_win) // 2, 2)
            out = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(t16, jnp.int32),  # W*win/2
                    lens.astype(jnp.int32),                     # W
                    base.astype(jnp.int32)[:, None],            # 1
                    echo.astype(jnp.int32)[:, None],            # 1
                    scores.astype(jnp.float32).view(jnp.int32),  # W
                ],
                axis=1,
            )
        else:
            n = jnp.where(adv, n, 0)
            out = jnp.concatenate(
                [toks.astype(jnp.int32), n.astype(jnp.int32)[:, None]], axis=1
            )
        return out, new_carry, new_enc_state, new_dec_state

    # ------------------------------------------------------------- streams
    def open_stream(self) -> Optional[int]:
        with self._lock:
            if not self._free:
                return None
            lane = self._free.pop(0)
            self.streams[lane] = StreamState()
            if self._native_stg is not None:
                self._native_stg.reset_lane(lane)
                self._active[lane] = 1
                self._closed[lane] = 0
            self._reset_lane(lane)
            return lane

    def close_stream(self, lane: int):
        """Mark EOS: remaining buffered audio is flushed on the next ticks."""
        with self._lock:
            if lane in self.streams:
                self.streams[lane].closed = True
                if self._native_stg is not None:
                    self._closed[lane] = 1

    def lane_frames(self, lane: int) -> int:
        """Decoder frames (60 ms ticks) this lane has consumed so far —
        the serving state-reset router keys segment handover on it."""
        with self._lock:
            if self._native_ser is not None:
                return self._native_ser.frame_idx(lane)
            st = self.streams.get(lane)
            return st.frame_idx if st is not None else 0

    def set_lane_frame_base(self, lane: int, frames: int):
        """Start the lane's response clock at an absolute frame index, so a
        mid-stream shadow lane (serving state resets) emits stream-absolute
        timestamps instead of lane-relative ones."""
        with self._lock:
            if self._native_ser is not None:
                self._native_ser.set_frame_idx(lane, frames)
            st = self.streams.get(lane)
            if st is not None:
                st.frame_idx = frames

    def _reset_lane(self, lane: int):
        """Queue a device-state reset for the lane: applied inside the next
        dispatched tick via the meta reset mask (one fused select for any
        number of opens; per-open `.at[lane].set()` scatter dispatches would
        also race the uploader thread's donated state chain)."""
        if self._native_ser is not None:
            self._native_ser.reset_lane(lane)
        self._pending_resets.add(lane)

    @staticmethod
    def _to_i16(samples: np.ndarray) -> np.ndarray:
        if isinstance(samples, np.ndarray) and samples.dtype == np.int16:
            return samples
        x = np.asarray(samples, np.float32)
        return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)

    def push_audio(self, lane: int, samples: np.ndarray):
        """Buffer audio for a lane: int16 PCM (the wire format, pushed as-is)
        or float32 in [-1, 1) (converted)."""
        with self._lock:
            st = self.streams[lane]
            if self._native_stg is not None:
                self._native_stg.push(lane, samples)
                return
            st.chunks.append(self._to_i16(samples))
            st.buf_len += len(samples)

    def push_audio_block(self, block: np.ndarray, lanes=None):
        """Push row i of ``block`` ([m, n] int16 or float32) to lane
        ``lanes[i]`` (or lane i when lanes is None). One lock acquire and
        (on the native path) one C call for all m lanes — the per-lane
        Python call loop costs ~7 us/lane, ~30 ms/tick at B=4k."""
        with self._lock:
            if self._native_stg is not None:
                self._native_stg.push_rows(block, lanes)
                return
            it = range(block.shape[0]) if lanes is None else lanes
            for i, lane in enumerate(it):
                st = self.streams[lane]
                st.chunks.append(self._to_i16(block[i]))
                st.buf_len += block.shape[1]

    def _release(self, lane: int):
        del self.streams[lane]
        if self._native_stg is not None:
            self._active[lane] = 0
        self._free.append(lane)

    # ----------------------------------------------------------------- tick
    def tick(self) -> Dict[int, dict]:
        """Advance every lane that has a full chunk buffered (or is flushing).

        Returns {lane: response dict} for lanes that produced output this
        tick; releases lanes whose EOS flush completed.
        """
        with self._lock:
            return self._tick_locked()

    def poll(self) -> Dict[int, dict]:
        """Drain any in-flight ticks whose device->host fetch has already
        completed, WITHOUT advancing lanes — so a server loop can ship
        responses the moment the device finishes rather than holding them
        until the next 60 ms tick (cuts steady-state response-completion
        latency by up to one chunk period under pipelining). Non-blocking:
        an in-flight tick that is still fetching stays pending. Returns the
        same shape as tick() ({} / empty WireTick when nothing is ready)."""
        with self._lock:
            out: Dict[int, List[dict]] = {}
            wire: Optional[List[Tuple[bytes, np.ndarray]]] = (
                [] if self._wire else None
            )
            while self._pending:
                entry = self._pending[0]
                ev = entry[2]
                if ev is not None:
                    if not ev.is_set():
                        break
                else:  # non-pipelined path: JAX array readiness probe
                    ready = getattr(entry[0], "is_ready", None)
                    if ready is None or not ready():
                        break
                self._consume(self._pending.popleft(), out, wire)
            if wire is not None:
                return WireTick(wire, out)
            return {
                lane: (msgs if len(msgs) > 1 else msgs[0])
                for lane, msgs in out.items()
            }

    def _pop_into(self, st: StreamState, dst: np.ndarray) -> int:
        """Move up to len(dst) buffered samples into dst (zero-padding any
        shortfall); returns the number of real samples consumed."""
        need, got = len(dst), 0
        while st.chunks and got < need:
            c = st.chunks[0]
            take = min(len(c), need - got)
            dst[got : got + take] = c[:take]
            if take == len(c):
                st.chunks.pop(0)
            else:
                st.chunks[0] = c[take:]
            got += take
        if got < need:
            dst[got:] = 0.0
        st.buf_len -= got
        return got

    def _tick_locked(self) -> Dict[int, dict]:
        if not self.streams:
            return WireTick([], {}) if self._wire else {}
        prb = self._probe
        if prb is not None:
            t_start = time.perf_counter()
            for k in ("slot", "stage", "wait", "consume", "total"):
                prb[k].append(0.0)
        if self._slot_pool is not None:
            # blocks when both slots are in the uploader — the backpressure
            # that makes steady-state tick time max(upload, device, host)
            samples = self._slot_pool.get()
        else:
            if not hasattr(self, "_staging"):
                # persistent staging matrix: rows of idle lanes keep stale
                # data, harmless — the jitted tick gates state on `adv`
                self._staging = np.zeros((self.B, self.hop_samples), np.int16)
            samples = self._staging
        if prb is not None:
            t_now = time.perf_counter()
            prb["slot"][-1] = t_now - t_start
            t_stage0 = t_now
        if self._native_stg is not None:
            adv, fin = self._native_stg.tick(samples, self._active, self._closed)
            finishing = [int(l) for l in np.flatnonzero(fin)]
        else:
            adv = np.zeros(self.B, bool)
            finishing = []
            for lane, st in self.streams.items():
                if st.buf_len < self.hop_samples:
                    if not st.closed:
                        continue
                    if st.buf_len == 0:
                        finishing.append(lane)
                        continue
                # hop samples only: the window/preemph carry is device state
                self._pop_into(st, samples[lane])
                adv[lane] = True

        rebase = np.zeros(self.B, np.int32)
        if self.decoder == "beam":
            # long-form streams: shift committed tokens out of the device
            # buffers before they can hit the cap. Margin covers in-flight
            # growth (the trigger data is pipeline_depth ticks stale).
            margin = (self.pipeline_depth + 2) * self._beam_expansions
            ns = self._native_ser
            dev_len = getattr(self, "_dev_len", None)
            for lane, st in self.streams.items():
                dl = (
                    int(dev_len[lane])
                    if ns is not None and dev_len is not None
                    else st.dev_len
                )
                if (adv[lane] and not st.rebase_pending
                        and dl + margin >= self._beam_cap):
                    committed = (
                        ns.committed(lane) if ns is not None else st.committed
                    )
                    if committed > 0:
                        rebase[lane] = committed
                        st.rebase_pending = True

        if prb is not None:
            prb["stage"][-1] = time.perf_counter() - t_stage0
        out: Dict[int, List[dict]] = {}
        wire: Optional[List[Tuple[bytes, np.ndarray]]] = (
            [] if self._wire else None
        )
        if adv.any():
            self._tick_count += 1
            meta = np.empty(3 * self.B + 1, np.int32)
            meta[: self.B] = adv
            meta[self.B : 2 * self.B] = rebase
            meta[2 * self.B : 3 * self.B] = 0
            for lane in self._pending_resets:
                meta[2 * self.B + lane] = 1
            self._pending_resets.clear()
            meta[-1] = self._tick_count
            if self._upq is not None:
                # hand the filled slot to the uploader: its (slow) upload
                # overlaps this thread's response drain + the device's work
                self._upq.put((samples, meta, adv))
                # drain whatever the fetcher already finished, oldest first
                # (keeps latency at fetch-time rather than a fixed depth)
                while self._pending and self._pending[0][2].is_set():
                    self._consume(self._pending.popleft(), out, wire)
                while len(self._pending) > self.pipeline_depth:
                    self._consume(self._pending.popleft(), out, wire)
            else:
                with self._state_lock:
                    packed, self._carry, self.enc_state, self.dec_state = (
                        self._jit_tick(
                            self.params,
                            self._dput(samples),  # int16; scaled on device
                            self._carry,
                            self.enc_state,
                            self.dec_state,
                            self._init_dec,
                            self._dput(meta),
                        )
                    )
                try:
                    packed.copy_to_host_async()
                except Exception:
                    pass  # backend without async copies: the fetch blocks
                self._pending.append([packed, adv, None])
                while len(self._pending) > self.pipeline_depth:
                    self._consume(self._pending.popleft(), out, wire)
        elif self._slot_pool is not None:
            self._slot_pool.put(samples)  # nothing advanced: return the slot

        if finishing:
            # final flush reads the lane's full device-side buffers; drain
            # the upload queue, then every in-flight tick, so `committed`
            # and the device beam buffers are up to date
            if self._upq is not None:
                self._upq.join()
            while self._pending:
                self._consume(self._pending.popleft(), out, wire)
        for lane in finishing:
            msgs = out.get(lane, [])
            if self.decoder == "beam":
                st = self.streams[lane]
                if self._native_ser is not None:
                    committed = self._native_ser.committed(lane)
                    st.frame_idx = self._native_ser.frame_idx(lane)
                else:
                    committed = st.committed
                with self._state_lock:  # uploads drained above; cheap
                    toks_l = np.asarray(self.dec_state["toks"][lane])
                    lens_l = np.asarray(self.dec_state["lens"][lane])
                    scores_l = np.asarray(self.dec_state["scores"][lane])
                norm = scores_l / np.maximum(lens_l + 1, 1)
                best = int(np.argmax(norm))
                tail = [int(t) for t in toks_l[best, committed : lens_l[best]]]
                if tail:
                    msgs.append(self._response(st, tail, final=True))
            msgs.append({"eos": True})
            out[lane] = msgs
            self._reset_lane(lane)
            self._release(lane)
        if prb is not None:
            prb["total"][-1] = time.perf_counter() - t_start
        if wire is not None:
            return WireTick(wire, out)
        return {
            lane: (msgs if len(msgs) > 1 else msgs[0]) for lane, msgs in out.items()
        }

    def _consume(self, entry, out: Dict[int, List[dict]], wire=None):
        """Fetch one in-flight tick's packed outputs and append the derived
        responses to `out` (a lane can accumulate responses from several
        drained ticks). In wire mode (`wire` is a list), native-serializer
        responses stay as one (bytes arena, index) segment appended to
        `wire` instead of being split into per-lane Python strings."""
        packed, adv, ev = entry
        prb = self._probe
        t0 = time.perf_counter() if prb is not None else 0.0
        if ev is not None:
            ev.wait()
            packed = entry[0]
            if isinstance(packed, Exception):
                raise packed
        if prb is not None:
            t_now = time.perf_counter()
            prb["wait"][-1] += t_now - t0
            t0 = t_now
        packed = np.asarray(packed)
        if self.decoder == "beam":
            # reverse the wire compaction: int32 lanes -> int16 token pairs
            # -> the legacy [toks(W*win) | lens | base | echo | scores]
            # int32 layout both response paths (native C and Python) parse
            half = (self.beam_width * self._beam_win) // 2
            t16 = np.ascontiguousarray(packed[:, :half]).view(np.int16)
            packed = np.concatenate(
                [t16.astype(np.int32), packed[:, half:]], axis=1
            )
        if self._native_ser is not None:
            if self.decoder == "beam":
                if wire is not None:
                    raw, idx, dev_len = self._native_ser.beam_tick_raw(
                        packed, adv
                    )
                else:
                    recs, dev_len = self._native_ser.beam_tick(packed, adv)
                self._dev_len = dev_len
                W, win = self.beam_width, self._beam_win
                echo = packed[:, W * win + W + 1]
                for lane in np.flatnonzero((echo > 0) & adv):
                    st = self.streams.get(int(lane))
                    if st is not None:
                        st.rebase_pending = False
            elif wire is not None:
                raw, idx = self._native_ser.greedy_tick_raw(packed, adv)
            else:
                recs = self._native_ser.greedy_tick(packed, adv)
            if wire is not None:
                if len(idx):
                    # idx views a buffer the next raw call overwrites — copy
                    wire.append((raw, idx.copy()))
            else:
                for lane, msgs in recs.items():
                    if lane in self.streams:
                        out.setdefault(lane, []).extend(msgs)
            if prb is not None:
                prb["consume"][-1] += time.perf_counter() - t0
            return
        if self.decoder == "beam":
            W, win = self.beam_width, self._beam_win
            toks = packed[:, : W * win].reshape(-1, W, win)
            lens = packed[:, W * win : W * win + W]
            base = packed[:, W * win + W]
            echo = packed[:, W * win + W + 1]
            scores = packed[:, W * win + W + 2 :].view(np.float32)
            # batch-vectorized pre-computation (a python loop over hyps per
            # lane costs ~25 us/lane — 25 ms/tick at B=1024):
            alive = scores > -1e29
            norm = np.where(alive, scores / np.maximum(lens + 1, 1), -np.inf)
            best = np.argmax(norm, axis=1)                       # [B]
            # agree[b, j]: every alive hypothesis matches the best one at
            # window position j
            bt = np.take_along_axis(toks, best[:, None, None], axis=1)  # [B,1,win]
            agree = ((toks == bt) | ~alive[:, :, None]).all(axis=1)     # [B,win]
            min_len = np.where(alive, lens, np.iinfo(np.int64).max).min(axis=1)
            for lane, st in list(self.streams.items()):
                if not adv[lane]:
                    continue
                r = int(echo[lane])
                if r:
                    # the device dropped r committed positions this tick:
                    # shift host coordinates before interpreting its outputs
                    st.committed -= r
                    st.hist = st.hist[r:]
                    st.rebase_pending = False
                st.dev_len = int(lens[lane].max())
                resp = self._beam_responses(
                    st, toks[lane], lens[lane], scores[lane], int(base[lane]),
                    bool(alive[lane].any()), int(best[lane]),
                    agree[lane], int(min_len[lane]),
                )
                if resp:
                    out.setdefault(lane, []).extend(
                        resp if isinstance(resp, list) else [resp]
                    )
                st.frame_idx += 1
        else:
            toks, n = packed[:, :-1], packed[:, -1]
            for lane, st in list(self.streams.items()):
                if not adv[lane]:
                    continue
                emitted = [int(t) for t in toks[lane, : n[lane]]]
                if emitted:
                    out.setdefault(lane, []).append(
                        self._response(st, emitted, final=True)
                    )
                st.frame_idx += 1
        if prb is not None:
            prb["consume"][-1] += time.perf_counter() - t0

    def _beam_responses(
        self, st: StreamState, win_toks, lens, scores, base,
        any_alive, best, agree, min_len,
    ):
        """Derive final (common-prefix growth) + provisional (best hyp tail)
        responses from a windowed view of the lane's beam buffers
        (reference serialise_responses.py semantics).

        win_toks: [W, win] — the newest `_beam_win` token slots of every
        hypothesis, covering absolute positions [base, base+win). Only the
        window crosses device->host per tick (full [W, cap] buffers dominate
        tick time at scale). The best hypothesis' window is snapshotted into
        st.hist so that if the beam agreement point ever stalls more than a
        window behind the longest hypothesis, the gap is force-committed
        from history (standard streaming commit-on-timeout behaviour).

        any_alive/best/agree/min_len are precomputed batch-vectorized by the
        caller (_consume): best = best-normalized-score hypothesis index,
        agree[j] = all alive hypotheses match at window position j,
        min_len = shortest alive hypothesis length."""
        if not any_alive:
            return None
        blen = int(lens[best])
        if blen > len(st.hist):
            st.hist = np.concatenate(
                [st.hist, np.zeros(blen - len(st.hist), np.int64)]
            )
        if blen > base:
            st.hist[base:blen] = win_toks[best, : blen - base]
        msgs = []
        if st.committed < base:  # agreement slid out of the window
            msgs.append(
                self._response(
                    st, [int(t) for t in st.hist[st.committed : base]], final=True
                )
            )
            st.committed = base
        p = st.committed
        if min_len > p:
            dis = np.flatnonzero(~agree[p - base : min_len - base])
            p = p + int(dis[0]) if len(dis) else min_len
        if p > st.committed:
            msgs.append(
                self._response(
                    st,
                    [int(t) for t in win_toks[best, st.committed - base : p - base]],
                    final=True,
                )
            )
            st.committed = p
        tail = [int(t) for t in win_toks[best, p - base : blen - base]]
        if tail:
            msgs.append(self._response(st, tail, final=False))
        if not msgs:
            return None
        return msgs if len(msgs) > 1 else msgs[0]

    def _response(self, st: StreamState, tokens: List[int], final: bool) -> dict:
        """WebSocket response schema (docs/src/inference/websocket_api.md).

        Word-boundary markers must survive response chunking: clients
        concatenate finals verbatim, so a piece-initial ▁ becomes a real
        leading space (plain detokenize() would strip it)."""
        if self.tokenizer is not None and hasattr(self.tokenizer, "id_to_piece"):
            text = "".join(
                self.tokenizer.id_to_piece(t) for t in tokens
            ).replace("▁", " ")
        elif self.tokenizer is not None:
            text = self.tokenizer.detokenize(tokens)
        else:
            text = ""
        t = st.frame_idx * self.frame_seconds
        return {
            "start": round(t, 3),
            "end": round(t + self.frame_seconds, 3),
            "is_provisional": not final,
            "alternatives": [{"transcript": text, "confidence": 1.0}],
        }


def _roll_left(x, r, axis: int):
    """Per-lane left roll by r[b] (int32 [B]) along `axis` (wraps around;
    callers only ever read below the post-shift valid length, so the
    wrapped tail is don't-care). A general per-lane gather along a long
    axis lowers to scalar-indexed gathers on TPU (~14 ms at [1024, 4, 256]
    measured); this bit-decomposed sequence of STATIC rolls + selects is
    ~14x faster."""
    n = x.shape[axis]
    r = r.astype(jnp.int32)
    bshape = [1] * x.ndim
    bshape[0] = x.shape[0]
    for k in range(max((n - 1).bit_length(), 1)):
        shifted = jnp.roll(x, -(1 << k), axis=axis)
        bit = (((r >> k) & 1) == 1).reshape(bshape)
        x = jnp.where(bit, shifted, x)
    return x


def _gate_state(new, old, adv, lane_axis_rank4: int = 1):
    """Select new vs old per lane. Lane-batch axis conventions: rank-1 [B];
    rank-2 [B, *]; rank-3 [L, B, H] for LSTM stacks, else [B, *, *];
    rank-4 [L, B, W, H]."""

    def g(a, b):
        if a.ndim == 4:       # [L, B, W, H]
            m = adv[None, :, None, None]
        elif a.ndim == 3:
            if a.shape[1] == adv.shape[0] and a.shape[0] != adv.shape[0]:
                m = adv[None, :, None]   # [L, B, H]
            else:
                m = adv[:, None, None]   # [B, W, cap] / [B, W, Hj]
        elif a.ndim == 2:     # [B, *]
            m = adv[:, None]
        else:                 # [B]
            m = adv
        return jnp.where(m, a, b)

    return jax.tree.map(g, new, old)
