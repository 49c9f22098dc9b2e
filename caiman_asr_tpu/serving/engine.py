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
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.decoding.greedy import make_streaming_step
from caiman_asr_tpu.models.rnnt import RNNT, _linear
from caiman_asr_tpu.models.state import EncoderState
from caiman_asr_tpu.ops.features import stack_subsample_frames
from caiman_asr_tpu.ops.logmel import LogMelConfig, dft_bases, hann_window, mel_filterbank


@dataclass
class StreamState:
    """Host-side per-lane bookkeeping."""

    buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    carry: Optional[np.ndarray] = None  # [1201] trailing samples incl. preemph
    frame_idx: int = 0                  # decoder frames emitted so far
    closed: bool = False                # EOS received; flush then free
    committed: int = 0                  # beam tokens already shipped as finals


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
    ):
        self.model = model
        self.params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
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
        self._cos = jnp.asarray(cos_b * w, dtype)
        self._sin = jnp.asarray(sin_b * w, dtype)
        self._fb = jnp.asarray(
            mel_filterbank(logmel.sample_rate, logmel.n_fft, logmel.n_mels), dtype
        )
        if mel_stats is not None:
            self._mean = jnp.asarray(mel_stats[0], dtype)
            self._std = jnp.asarray(mel_stats[1], dtype)
        else:
            self._mean = jnp.zeros((logmel.n_mels,), dtype)
            self._std = jnp.ones((logmel.n_mels,), dtype)

        self.decoder = decoder
        self.beam_width = beam_width
        if decoder == "beam":
            from caiman_asr_tpu.decoding.fast_beam import make_streaming_beam_step

            self._init_beam, self._beam_step = make_streaming_beam_step(
                model, blank_idx, beam_width=beam_width,
                expansions=min(max_symbols_per_step, 8), cap=beam_cap,
            )
        else:
            self._decode_step = make_streaming_step(
                model, blank_idx, max_symbols_per_step=max_symbols_per_step
            )
        self._jit_tick = jax.jit(self._tick_impl, donate_argnums=(2, 3))
        self._tick_count = 0
        self._rng0 = jax.random.PRNGKey(4242)

        self.enc_state = self._zero_enc_state()
        self.dec_state = self._zero_dec_state()
        self._init_dec = jax.tree.map(jnp.copy, self.dec_state)
        self.streams: Dict[int, StreamState] = {}
        self._free = list(range(self.B))
        # The server ticks from an executor thread while connection handlers
        # open/close/push from the event loop — serialize engine access.
        import threading

        self._lock = threading.RLock()

    def warmup(self):
        """Force-compile the tick program before serving traffic (first-tick
        JIT latency would otherwise hit the first streams)."""
        samples = jnp.zeros((self.B, self.carry_samples + self.hop_samples), self.dtype)
        adv = jnp.zeros((self.B,), bool)
        # two passes: the second absorbs the weak-type-settling retrace so
        # live traffic never pays a compile
        for i in range(2):
            toks, n, self.enc_state, self.dec_state = self._jit_tick(
                self.params, samples, self.enc_state, self.dec_state, adv,
                jax.random.fold_in(self._rng0, i),
            )
        _ = np.asarray(toks)  # real barrier (block_until_ready is dispatch-only
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
            hard=c.hard_activations,
        )
        g = _linear(self.params["joint_pred"], y)
        return (g, h, cc)

    def _tick_impl(self, params, samples, enc_state, dec_state, adv, rng):
        """samples: [B, carry+hop]; adv: [B] bool — lanes that advance."""
        cfg = self.cfg
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
            new_dec_state = self._beam_step(params, f[:, 0], dec_state)
            toks = new_dec_state["toks"]
            n = new_dec_state["lens"]
        else:
            toks, n, new_dec_state = self._decode_step(params, f[:, 0], dec_state)

        # freeze state on lanes that did not advance
        new_enc_state = _gate_state(new_enc_state, enc_state, adv)
        new_dec_state = _gate_state(new_dec_state, dec_state, adv)
        n = jnp.where(adv[:, None] if n.ndim == 2 else adv, n, 0)
        return toks, n, new_enc_state, new_dec_state

    # ------------------------------------------------------------- streams
    def open_stream(self) -> Optional[int]:
        with self._lock:
            if not self._free:
                return None
            lane = self._free.pop(0)
            self.streams[lane] = StreamState(
                carry=np.zeros(self.carry_samples, np.float32)
            )
            self._reset_lane(lane)
            return lane

    def close_stream(self, lane: int):
        """Mark EOS: remaining buffered audio is flushed on the next ticks."""
        with self._lock:
            if lane in self.streams:
                self.streams[lane].closed = True

    def _reset_lane(self, lane: int):
        z = lambda x: x.at[..., lane, :].set(0.0)
        self.enc_state = EncoderState(
            pre_rnn=tuple(z(h) for h in self.enc_state.pre_rnn),
            post_rnn=tuple(z(h) for h in self.enc_state.post_rnn),
        )
        if self.decoder == "beam":
            def set_lane(cur, init):
                if cur.ndim == 4:          # [L, B, W, H]
                    return cur.at[:, lane].set(init[:, lane])
                if cur.ndim == 3 and cur.shape[1] != self.B:  # [B, W, *]
                    return cur.at[lane].set(init[lane])
                if cur.ndim == 3:          # [L, B, H] (not used in beam)
                    return cur.at[:, lane].set(init[:, lane])
                if cur.ndim == 2:          # [B, W]
                    return cur.at[lane].set(init[lane])
                return cur.at[lane].set(init[lane])  # [B]

            self.dec_state = jax.tree.map(set_lane, self.dec_state, self._init_dec)
        else:
            g0, h0, c0 = self._init_dec
            g, h, c = self.dec_state
            self.dec_state = (
                g.at[lane].set(g0[lane]),
                h.at[:, lane].set(h0[:, lane]),
                c.at[:, lane].set(c0[:, lane]),
            )

    def push_audio(self, lane: int, samples: np.ndarray):
        with self._lock:
            st = self.streams[lane]
            st.buffer = np.concatenate([st.buffer, samples.astype(np.float32)])

    def _release(self, lane: int):
        del self.streams[lane]
        self._free.append(lane)

    # ----------------------------------------------------------------- tick
    def tick(self) -> Dict[int, dict]:
        """Advance every lane that has a full chunk buffered (or is flushing).

        Returns {lane: response dict} for lanes that produced output this
        tick; releases lanes whose EOS flush completed.
        """
        with self._lock:
            return self._tick_locked()

    def _tick_locked(self) -> Dict[int, dict]:
        if not self.streams:
            return {}
        samples = np.zeros((self.B, self.carry_samples + self.hop_samples), np.float32)
        adv = np.zeros(self.B, bool)
        finishing: List[int] = []
        for lane, st in self.streams.items():
            if len(st.buffer) >= self.hop_samples:
                chunk, st.buffer = st.buffer[: self.hop_samples], st.buffer[self.hop_samples :]
            elif st.closed:
                if len(st.buffer) == 0:
                    finishing.append(lane)
                    continue
                chunk = np.zeros(self.hop_samples, np.float32)
                chunk[: len(st.buffer)] = st.buffer
                st.buffer = st.buffer[:0]
            else:
                continue
            samples[lane] = np.concatenate([st.carry, chunk])
            st.carry = samples[lane, -self.carry_samples :].copy()
            adv[lane] = True

        out: Dict[int, dict] = {}
        if adv.any():
            self._tick_count += 1
            toks, n, self.enc_state, self.dec_state = self._jit_tick(
                self.params,
                jnp.asarray(samples, self.dtype),
                self.enc_state,
                self.dec_state,
                jnp.asarray(adv),
                jax.random.fold_in(self._rng0, self._tick_count),
            )
            toks, n = np.asarray(toks), np.asarray(n)
            if self.decoder == "beam":
                scores = np.asarray(self.dec_state["scores"])
                for lane, st in list(self.streams.items()):
                    if not adv[lane]:
                        continue
                    resp = self._beam_responses(st, toks[lane], n[lane], scores[lane])
                    if resp:
                        out[lane] = resp
                    st.frame_idx += 1
            else:
                for lane, st in list(self.streams.items()):
                    if not adv[lane]:
                        continue
                    emitted = [int(t) for t in toks[lane, : n[lane]]]
                    if emitted:
                        out[lane] = self._response(st, emitted, final=True)
                    st.frame_idx += 1

        for lane in finishing:
            msgs = []
            if self.decoder == "beam":
                st = self.streams[lane]
                toks_l = np.asarray(self.dec_state["toks"][lane])
                lens_l = np.asarray(self.dec_state["lens"][lane])
                scores_l = np.asarray(self.dec_state["scores"][lane])
                norm = scores_l / np.maximum(lens_l + 1, 1)
                best = int(np.argmax(norm))
                tail = [int(t) for t in toks_l[best, st.committed : lens_l[best]]]
                if tail:
                    msgs.append(self._response(st, tail, final=True))
            msgs.append({"eos": True})
            out[lane] = msgs if len(msgs) > 1 else msgs[0]
            self._reset_lane(lane)
            self._release(lane)
        return out

    def _beam_responses(self, st: StreamState, toks, lens, scores):
        """Derive final (common-prefix growth) + provisional (best hyp tail)
        responses from the lane's beam buffers
        (reference serialise_responses.py semantics)."""
        alive = scores > -1e29
        if not alive.any():
            return None
        norm = np.where(alive, scores / np.maximum(lens + 1, 1), -np.inf)
        best = int(np.argmax(norm))
        min_len = int(lens[alive].min())
        p = st.committed
        while p < min_len and len(set(int(t) for t in toks[alive, p])) == 1:
            p += 1
        msgs = []
        if p > st.committed:
            msgs.append(
                self._response(st, [int(t) for t in toks[best, st.committed : p]],
                               final=True)
            )
            st.committed = p
        tail = [int(t) for t in toks[best, p : int(lens[best])]]
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
