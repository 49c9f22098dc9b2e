"""Batched greedy transducer decoding, fully jit-compiled.

TPU-native rework of the reference's tensorised lock-step greedy decoder
(training/caiman_asr_train/rnnt/batched_greedy.py:22-285). Semantics match:

- every stream advances in lock-step; a stream's encoder offset advances when
  it predicts blank (or hits ``max_symbols_per_step`` emissions on one frame);
- termination per stream: (at last frame and predicting blank) OR (at last
  frame and overflowing max_symbols) OR (reached max_symbol_per_sample
  non-blank emissions) — reference `_update_done` (batched_greedy.py:165-199);
- EOS strategies and fuzzy top-k logits are applied to normalised logprobs
  exactly as the reference's ``_joint_step`` (decoder.py:141-175).

Differences by design (TPU): the whole decode loop is one
``lax.while_loop`` with static shapes — no host round-trips per step, no
gather/scatter of active lanes (the prediction net runs on the full batch and
results are select-masked; on a TPU the batch runs in lock-step anyway).
Emitted (token, frame, logprob) triples land in fixed-size output buffers
via one dynamic scatter per step.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from caiman_asr_tpu.decoding.eos import EOSStrategy, apply_eos_strategy
from caiman_asr_tpu.decoding.fuzzy import get_topk_logits
from caiman_asr_tpu.decoding.response import (
    DecodingResponse,
    FrameResponses,
    HypothesisResponse,
)
from caiman_asr_tpu.models.rnnt import RNNT


class GreedyDecoder:
    """Greedy decoder over encoder features (reference API parity)."""

    def __init__(
        self,
        model: RNNT,
        blank_idx: int,
        eos_strategy: EOSStrategy = None,
        max_symbols_per_step: Optional[int] = 30,
        max_symbol_per_sample: Optional[int] = None,
        temperature: float = 1.0,
        fuzzy_topk_logits: bool = False,
        tokenizer=None,
        max_inputs_per_batch: int = int(1e7),
    ):
        self.model = model
        self.blank_idx = blank_idx
        self.eos_strategy = eos_strategy
        self.max_symbols = max_symbols_per_step or 30
        self.max_symbol_per_sample = max_symbol_per_sample
        self.temperature = temperature
        self.fuzzy = fuzzy_topk_logits
        self.tokenizer = tokenizer
        self.max_inputs_per_batch = max_inputs_per_batch
        self._jit_decode = jax.jit(self._decode_impl, static_argnames=("cap",))

    # -------------------------------------------------------------- core
    def _logprobs(self, params, f, g):
        logits = self.model.joint_step(params, f, g)
        if self.fuzzy:
            logits = get_topk_logits(logits)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32) / self.temperature, axis=-1)
        return apply_eos_strategy(lp, self.eos_strategy, self.blank_idx)

    def _decode_impl(self, params, encs, enc_lens, cap: int):
        """encs: [B, T, Hj]; enc_lens: [B]. Returns fixed-size buffers."""
        B, T, Hj = encs.shape
        L = self.model.cfg.pred_rnn_layers
        Hp = self.model.cfg.pred_n_hid

        h0 = jnp.zeros((L, B, Hp), encs.dtype)
        c0 = jnp.zeros((L, B, Hp), encs.dtype)
        g0, (h0, c0) = self.model.pred_step(params, None, (h0, c0))

        max_off = jnp.maximum(enc_lens.astype(jnp.int32) - 1, 0)
        state = dict(
            enc_offset=jnp.zeros(B, jnp.int32),
            done=enc_lens <= 0,
            g=g0,
            h=h0,
            c=c0,
            any_tok=jnp.zeros(B, jnp.int32),
            nb=jnp.zeros(B, jnp.int32),
            out_tok=jnp.full((B, cap), self.blank_idx, jnp.int32),
            out_ts=jnp.zeros((B, cap), jnp.int32),
            out_lp=jnp.zeros((B, cap), jnp.float32),
            count=jnp.zeros(B, jnp.int32),
            iters=jnp.int32(0),
        )
        max_iters = T * self.max_symbols + 8

        def cond(s):
            return (~jnp.all(s["done"])) & (s["iters"] < max_iters)

        def body(s):
            f = jnp.take_along_axis(encs, s["enc_offset"][:, None, None], axis=1)[:, 0]
            lp = self._logprobs(params, f, s["g"])
            k = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            klp = jnp.max(lp, axis=-1)

            at_end = s["enc_offset"] == max_off
            is_blank = k == self.blank_idx

            done = s["done"] | (at_end & is_blank)
            done = done | (at_end & (s["any_tok"] >= self.max_symbols))
            if self.max_symbol_per_sample is not None:
                done = done | (s["nb"] >= self.max_symbol_per_sample)

            emit = (~done) & (~is_blank)

            # Scatter emissions into the output buffers at position count.
            pos = jnp.clip(s["count"], 0, cap - 1)
            bix = jnp.arange(B)
            out_tok = s["out_tok"].at[bix, pos].set(
                jnp.where(emit, k, s["out_tok"][bix, pos])
            )
            out_ts = s["out_ts"].at[bix, pos].set(
                jnp.where(emit, s["enc_offset"], s["out_ts"][bix, pos])
            )
            out_lp = s["out_lp"].at[bix, pos].set(
                jnp.where(emit, klp, s["out_lp"][bix, pos])
            )
            count = s["count"] + emit.astype(jnp.int32)

            nb = s["nb"] + (~is_blank).astype(jnp.int32)
            any_tok = s["any_tok"] + (~is_blank).astype(jnp.int32)
            advance = is_blank | (any_tok >= self.max_symbols)
            any_tok = any_tok * (
                (any_tok < self.max_symbols) | at_end
            ).astype(jnp.int32)
            enc_offset = jnp.minimum(s["enc_offset"] + advance, max_off)

            # Prediction-net step on the whole batch; keep old state for
            # non-emitters (select, not gather/scatter).
            g_new, (h_new, c_new) = self.model.pred_step(params, k, (s["h"], s["c"]))
            g = jnp.where(emit[:, None], g_new, s["g"])
            h = jnp.where(emit[None, :, None], h_new, s["h"])
            c = jnp.where(emit[None, :, None], c_new, s["c"])

            return dict(
                enc_offset=enc_offset, done=done, g=g, h=h, c=c,
                any_tok=any_tok, nb=nb, out_tok=out_tok, out_ts=out_ts,
                out_lp=out_lp, count=count, iters=s["iters"] + 1,
            )

        final = lax.while_loop(cond, body, state)
        return final["out_tok"], final["out_ts"], final["out_lp"], final["count"]

    # ------------------------------------------------------------ public
    def decode_encs(
        self, params, encs, enc_lens, cap: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Decode from encoder output; returns numpy (tokens, ts, lps, counts)."""
        B, T, _ = encs.shape
        if cap is None:
            cap = int(
                min(
                    self.max_symbol_per_sample or T * self.max_symbols,
                    T * self.max_symbols,
                )
            )
        cap = max(cap, 1)
        toks, ts, lps, counts = self._jit_decode(params, encs, enc_lens, cap=cap)
        return (np.asarray(toks), np.asarray(ts), np.asarray(lps), np.asarray(counts))

    def decode(
        self, params, feats, feat_lens
    ) -> List[Dict[int, FrameResponses]]:
        """Full path: encoder + greedy loop -> per-utterance FrameResponses.

        feats: [T, B, in_feats] time-major features.
        """
        from caiman_asr_tpu.decoding.unbatch import encode_lower_batch_size

        encs, enc_lens = encode_lower_batch_size(
            self.model, params, feats, feat_lens, self.max_inputs_per_batch
        )
        toks, ts, lps, counts = self.decode_encs(params, encs, enc_lens)
        return self.build_responses(toks, ts, lps, counts)

    def build_responses(
        self, toks, ts, lps, counts
    ) -> List[Dict[int, FrameResponses]]:
        """Group emissions by frame into FrameResponses (greedy: all finals)."""
        out: List[Dict[int, FrameResponses]] = []
        B = toks.shape[0]
        for b in range(B):
            n = int(counts[b])
            resp: Dict[int, FrameResponses] = {}
            for i in range(n):
                t = int(ts[b, i])
                y = int(toks[b, i])
                p = float(np.exp(lps[b, i]))
                piece = self.tokenizer.id_to_piece(y) if self.tokenizer else ""
                if t not in resp:
                    resp[t] = FrameResponses(
                        partials=None,
                        final=DecodingResponse(
                            start_frame_idx=t,
                            duration_frames=1,
                            is_provisional=False,
                            alternatives=[
                                HypothesisResponse(
                                    y_seq=[y], timesteps=[t],
                                    token_seq=[piece], confidence=[p],
                                )
                            ],
                        ),
                    )
                else:
                    hyp = resp[t].final.alternatives[0]
                    hyp.y_seq.append(y)
                    hyp.timesteps.append(t)
                    hyp.token_seq.append(piece)
                    hyp.confidence.append(p)
            out.append(resp)
        return out


def make_streaming_step(
    model: RNNT,
    blank_idx: int,
    max_symbols_per_step: int = 8,
    temperature: float = 1.0,
    eos_strategy: EOSStrategy = None,
    fuzzy_topk_logits: bool = False,
):
    """Build the per-frame streaming decode step (the serving hot path).

    Returns a jittable function
      step(params, f [B, Hj], dec_state) -> (tokens [B, max_symbols], n [B], dec_state)
    processing exactly one encoder frame per stream with at most
    ``max_symbols_per_step`` emissions (static unrolled scan — constant
    latency, no recompiles). dec_state = (g [B, Hj], h, c [L, B, Hp]).

    CAIMAN_GREEDY_EARLY_EXIT=1 swaps the unroll for a bounded early-exit
    ``lax.while_loop`` (exit once every lane has hit its first blank —
    exact, a lane's state freezes at its first blank). Measured on v5e at
    B=16384 the unroll WINS (62.9 vs 71.5 ms/tick): the all-lanes-stopped
    AND almost never fires with that many lanes (one busy lane keeps the
    whole batch iterating) while the while_loop forfeits cross-iteration
    pipelining and pays a 16k-lane reduction per trip. The knob exists for
    small-B deployments where the early exit can win. (The beam tick keeps
    its early exit — its improvability bound fires per-tick regardless of
    batch size, measured win in fast_beam.py.)
    """

    def logprobs(params, f, g):
        logits = model.joint_step(params, f, g)
        if fuzzy_topk_logits:
            logits = get_topk_logits(logits)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, axis=-1)
        return apply_eos_strategy(lp, eos_strategy, blank_idx)

    # Serving fast path: with no EOS correction, argmax(logits) ==
    # argmax(log_softmax(logits/T)) — skip materialising the normalised
    # [B, K] tensor entirely (saves ~1/3 of the decode-step HBM traffic).
    fast = eos_strategy is None and not fuzzy_topk_logits

    def argmax_tokens(params, f, g):
        logits = model.joint_step(params, f, g)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    early_exit = os.environ.get("CAIMAN_GREEDY_EARLY_EXIT", "0") == "1"

    def step(params, f, dec_state):
        g, h, c = dec_state
        B = f.shape[0]
        toks0 = jnp.full((B, max_symbols_per_step), blank_idx, jnp.int32)
        stopped0 = jnp.zeros(B, bool)
        n0 = jnp.zeros(B, jnp.int32)

        def body_core(i, toks, n, stopped, g, h, c):
            if fast:
                k = argmax_tokens(params, f, g)
            else:
                lp = logprobs(params, f, g)
                k = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            emit = (~stopped) & (k != blank_idx)
            toks = lax.dynamic_update_slice(
                toks, jnp.where(emit, k, blank_idx)[:, None], (0, i)
            )
            n = n + emit.astype(jnp.int32)
            g_new, (h_new, c_new) = model.pred_step(params, k, (h, c))
            g = jnp.where(emit[:, None], g_new, g)
            h = jnp.where(emit[None, :, None], h_new, h)
            c = jnp.where(emit[None, :, None], c_new, c)
            return toks, n, stopped | (~emit), g, h, c

        if early_exit:

            def cond(carry):
                i, _toks, _n, stopped, _g, _h, _c = carry
                return (i < max_symbols_per_step) & ~jnp.all(stopped)

            def body(carry):
                i, toks, n, stopped, g, h, c = carry
                return (i + 1,) + body_core(i, toks, n, stopped, g, h, c)

            _, toks, n, _, g, h, c = lax.while_loop(
                cond, body, (jnp.int32(0), toks0, n0, stopped0, g, h, c)
            )
        else:
            toks, n, stopped, g, h, c = toks0, n0, stopped0, g, h, c
            for i in range(max_symbols_per_step):
                toks, n, stopped, g, h, c = body_core(
                    jnp.int32(i), toks, n, stopped, g, h, c
                )
        return toks, n, (g, h, c)

    return step


def init_decode_state(model: RNNT, params, batch_size: int):
    """Initial (g, h, c) decode state for streaming."""
    L, Hp = model.cfg.pred_rnn_layers, model.cfg.pred_n_hid
    h = jnp.zeros((L, batch_size, Hp), jnp.float32)
    c = jnp.zeros((L, batch_size, Hp), jnp.float32)
    g, (h, c) = model.pred_step(params, None, (h, c))
    return g, h, c
