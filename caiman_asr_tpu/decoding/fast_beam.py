"""Fully-jitted batched beam search (the TPU-native fast path).

The adaptive host-scheduled beam (decoding/beam.py) matches the reference's
semantics exactly but keeps the search loop on the host — hundreds of
host<->device round trips per utterance, which is latency-bound on TPU.
This module is the TPU-first alternative: a **fixed-expansion,
label-synchronous beam** where the whole search for a batch of utterances
compiles to ONE XLA program (``lax.scan`` over frames, a small unrolled
expansion loop per frame, ``lax.top_k`` beam selection). No host in the
loop, static shapes throughout.

Algorithm per frame (cf. NVIDIA NeMo's batched MAES/ALSD family — the
standard accelerator formulation of transducer beam search):
  1. score the current W hypotheses against the frame: lp [B, W, K];
  2. blank-extend every hypothesis into a *finished* pool (token state
     frozen, score += lp[blank]) — pools merge by top-W;
  3. non-blank expansions: top-W of the W*K candidate continuations replace
     the active set (token appended, prediction-net advanced);
  4. repeat E times (E = max symbols per frame); the last round only
     blank-extends;
  5. the finished pool becomes the beam entering the next frame.

Reference-beam quality features, device-native:
  - **hypothesis merging** (ref rnnt/beam.py:467-511, hypothesis.py:116-120):
    a rolling uint32 hash over the token sequence rides in the beam state;
    duplicate (hash, len) entries in the blank/finished pool are logaddexp-
    merged into the highest-scoring copy (whose pred state is kept) before
    top-W selection. Token-level hash, not the reference's cleaned-string
    hash — sequences that differ in tokens but not text do not merge.
  - **n-gram shallow fusion** (ref rnnt/beam.py:496,629-642): an int32 LM
    automaton state per hypothesis; the state's full score row is gathered
    and added to the logits BEFORE the approx-top-W preselection, so fusion
    is vocab-wide exactly like the reference's (a post-preselect boost
    could never surface a token the acoustics alone left out of the
    shortlist). Costs one [B*W, K] gather+add per expansion, only when
    fusion is on.
  - **keyword boosting** (ref rnnt/beam.py:614-627): the weighted character
    trie determinized into the same dense automaton shape
    (keywords/device_table.py — provably identical to the host trie), fused
    the same vocab-wide way; boost deltas carry their own scale.

  - **adaptive pruning** (ref rnnt/beam.py:186-208,324-348): the
    reference's production thresholds, compiled into the fixed-shape
    search as score masking. ``topk_thresh`` drops expansion candidates
    more than the threshold below the row's best ACOUSTIC log-prob
    (fusion applies after the mask, exactly the host order);
    ``score_thresh`` kills kept hypotheses whose length-normalised score
    trails the lane best by more than the threshold (their slot drops to
    NEG_INF and can never re-surface). Masked slots mean the effective
    beam narrows exactly where the host beam would shrink ``kept``.
  - **final-emission depth pruning** (ref rnnt/beam.py:238-243): a
    device-tracked per-lane watermark of the beam's common-prefix length
    (== what the serialiser would have shipped as finals: finals advance
    exactly when the common prefix grows). When the watermark stalls for
    more than ``final_emission_frames`` frames, the weakest live
    hypothesis is dropped each frame until a final can ship — bounding
    how long finals (and thus UPL) can lag. The reference drops weakest
    hypotheses in a host loop until the serialiser emits; per-frame
    single drops give the same bound with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

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
from caiman_asr_tpu.models.rnnt import RNNT, _linear
from caiman_asr_tpu.ops.lstm import lstm_step

NEG_INF = -1.0e30
HASH_MULT = np.uint32(1000003)


def _hash_step(h, token):
    """Rolling token-sequence hash (uint32, wraps)."""
    return h * HASH_MULT + token.astype(jnp.uint32) + jnp.uint32(1)


def _kw_tables(keywords):
    """(score, next_state, init) jnp triple from a DeviceKeywords, or None.
    Same automaton interface as the n-gram tables; the boost deltas carry
    their own scale, so fusion uses them unscaled (the host beam adds the
    trie delta directly, beam.py:333-337; ref rnnt/beam.py:614-627)."""
    if keywords is None:
        return None
    return (
        jnp.asarray(keywords.score),
        jnp.asarray(keywords.next_state),
        int(keywords.init_state),
    )


def _lm_tables(ngram_lm, ngram_alpha: float):
    """Device-resident (score, next_state, init_state) from a DeviceNgram,
    or None when fusion is off."""
    if ngram_lm is None or ngram_alpha <= 0.0:
        return None
    return (
        jnp.asarray(ngram_lm.score),
        jnp.asarray(ngram_lm.next_state),
        int(ngram_lm.init_state),
    )


def _improvable(active, finished, W: int, merge: bool):
    """Whether ANY lane's active hypotheses can still change the finished
    top-W. Log-probs are <= 0, so active scores only decrease with further
    expansion: once every active score sits below the lane's worst kept
    finished score, no future candidate can be selected — an EXACT early
    exit for the expansion loop. With merging, sub-threshold candidates can
    still logaddexp mass into kept hypotheses, so keep iterating until that
    mass is below float32 significance (exp(-16) relative)."""
    slack = 16.0 if merge else 0.0
    worst_kept = finished["scores"][:, W - 1]  # top_k output is sorted
    best_active = jnp.max(active["scores"], axis=1)
    return jnp.any(best_active > worst_kept - slack)


def _gather_w(tree, idx, L: int):
    """Gather beam lanes by idx [B, W'] along each leaf's W axis.

    Rank>=3 leaves use a one-hot multiply-sum instead of take_along_axis:
    general gathers lower to scalar-indexed loops on TPU (~2x slower here,
    and far worse on long trailing axes). The mask is 0/1 so the reduction
    is exact for every dtype (bf16 states, int32 tokens, uint32 hashes)."""
    def g(x):
        if x.ndim <= 2:  # [B, M] scores/lens/hash/lm — tiny, gather is fine
            return jnp.take_along_axis(x, idx, axis=1)
        if x.ndim == 4 and x.shape[0] == L:  # [L, B, M, H]
            oh = (idx[..., None] == jnp.arange(x.shape[2])).astype(x.dtype)
            return jnp.sum(oh[None, :, :, :, None] * x[:, :, None, :, :], axis=3)
        # [B, M, C] (toks/ts/g)
        oh = (idx[..., None] == jnp.arange(x.shape[1])).astype(x.dtype)
        return jnp.sum(oh[..., None] * x[:, None, :, :], axis=2)

    return jax.tree.map(g, tree)


def _merged_scores(s, h, l):
    """logaddexp duplicate (hash, len) entries into their best-scoring copy
    (which keeps its pred/LM state — ref beam.py:507-512); the other copies
    drop to NEG_INF. s, h, l: [B, M]."""
    alive = s > NEG_INF / 2
    eq = (
        (h[:, :, None] == h[:, None, :])
        & (l[:, :, None] == l[:, None, :])
        & alive[:, :, None]
        & alive[:, None, :]
    )
    contrib = jnp.where(eq, s[:, None, :], NEG_INF)  # [B, i, j]
    m = jnp.max(contrib, axis=-1)
    merged = m + jnp.log(jnp.sum(jnp.exp(contrib - m[..., None]), axis=-1))
    best = jnp.argmax(contrib, axis=-1)  # best duplicate for row i
    keeper = best == lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(alive & keeper, merged, NEG_INF)


def _opt_thresh(v):
    """Normalize a pruning-threshold option: None / inf / negative all
    disable (the host beam CLI's ``<0 -> inf`` convention)."""
    v = None if v is None else float(v)
    return None if v is None or not np.isfinite(v) or v < 0 else v


def _apply_score_thresh(scores, lens, thresh):
    """Kill hypotheses whose length-normalised score trails the lane best
    by more than ``thresh`` (host beam _prune_scores; ref beam.py:364-366:
    ``normalised_score = score / y_length_tot``, SOS counts one)."""
    norm = scores / jnp.maximum(lens + 1, 1).astype(jnp.float32)
    bar = jnp.max(norm, axis=1, keepdims=True)
    return jnp.where(norm >= bar - thresh, scores, NEG_INF)


def _final_emission_prune(scores, toks, lens, committed, since, limit):
    """Final-emission depth pruning, device formulation (ref
    beam.py:227-243): finals ship exactly when the beam's common token
    prefix grows (serialise_responses), so track a per-lane watermark
    ``committed`` of the common-prefix length. When it stalls longer than
    ``limit`` frames while the best hypothesis holds uncommitted tokens,
    drop every live hypothesis blocking the divergence point — lanes that
    are shorter than ``committed``+1 or disagree with the best lane's
    token there. The host loops "drop weakest, re-serialise" until the
    final ships within the frame; this resolves the same divergence in
    one fused mask, so the final ships at the next frame (lag bound:
    ``limit``+2 frames whenever tokens are lagging).

    Returns (scores, committed, since) — callers gate the counters on
    frame validity."""
    live = scores > NEG_INF / 2
    n_live = jnp.sum(live.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores, axis=1)
    ref_toks = jnp.take_along_axis(toks, best[:, None, None], axis=1)
    agree = (toks == ref_toks) | ~live[:, :, None]
    agree_all = jnp.all(agree, axis=1)  # [B, cap]
    big = jnp.int32(1 << 30)
    minlen = jnp.min(jnp.where(live, lens, big), axis=1)
    pos = lax.broadcasted_iota(jnp.int32, agree_all.shape, 1)
    cp = jnp.sum(
        (jnp.cumprod(agree_all.astype(jnp.int32), axis=1) > 0)
        & (pos < minlen[:, None]),
        axis=1,
        dtype=jnp.int32,
    )
    # a collapsed beam commits everything it has
    best_len = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    cp = jnp.where(n_live <= 1, best_len, cp)
    advanced = cp > committed
    committed = jnp.maximum(cp, committed)
    since = jnp.where(advanced, 0, since + 1)
    # only prune when the best hypothesis actually has lagging tokens
    lagging = best_len > committed
    over = (since > limit) & (n_live > 1) & lagging
    cap_i = toks.shape[2] - 1
    at_cm = jnp.minimum(committed, cap_i)[:, None, None]
    div_tok = jnp.take_along_axis(toks, jnp.broadcast_to(
        at_cm, (toks.shape[0], toks.shape[1], 1)), axis=2)[:, :, 0]
    best_div = jnp.take_along_axis(div_tok, best[:, None], axis=1)
    extends = (lens > committed[:, None]) & (div_tok == best_div)
    wix = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    keep = extends | (wix == best[:, None])
    drop = over[:, None] & ~keep
    return jnp.where(drop, NEG_INF, scores), committed, since


class FastBeamDecoder:
    """Batched jitted beam decoder; API-compatible with GreedyDecoder."""

    def __init__(
        self,
        model: RNNT,
        blank_idx: int,
        beam_width: int = 4,
        max_symbols_per_step: int = 4,
        temperature: float = 1.4,
        eos_strategy: EOSStrategy = None,
        fuzzy_topk_logits: bool = False,
        tokenizer=None,
        cap: int = 256,
        ngram_lm=None,
        ngram_alpha: float = 0.0,
        keywords=None,
        merge: bool = True,
        max_inputs_per_batch: int = int(1e7),
        score_thresh: Optional[float] = None,
        topk_thresh: Optional[float] = None,
        final_emission_frames: Optional[int] = None,
    ):
        """score_thresh / topk_thresh / final_emission_frames: the host
        adaptive beam's pruning thresholds (beam_prune_score_thresh 0.4,
        beam_prune_topk_thresh 1.5, final_emission_thresh in frames),
        compiled into the device search; None / inf disables each."""
        self.model = model
        self.blank_idx = blank_idx
        self.max_inputs_per_batch = max_inputs_per_batch
        self.W = beam_width
        self.E = max_symbols_per_step
        self.temperature = temperature
        self.eos_strategy = eos_strategy
        self.fuzzy = fuzzy_topk_logits
        self.tokenizer = tokenizer
        self.cap = cap
        self.merge = merge

        self.score_thresh = _opt_thresh(score_thresh)
        self.topk_thresh = _opt_thresh(topk_thresh)
        fe = _opt_thresh(final_emission_frames)
        self.final_emission_frames = None if fe is None else int(fe)
        self.ngram_alpha = float(ngram_alpha)
        self.lm = _lm_tables(ngram_lm, ngram_alpha)
        self.kw = _kw_tables(keywords)
        self._jit_decode = jax.jit(self._decode_impl, static_argnames=("cap",))

    # ----------------------------------------------------------- internals
    def _logprobs(self, params, f, g):
        """f: [B, Hj]; g: [B, W, Hj] -> lp [B, W, K]."""
        logits = _linear(params["joint_fc"], jax.nn.relu(f[:, None, :] + g))
        if self.fuzzy:
            logits = get_topk_logits(logits)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32) / self.temperature, -1)
        return apply_eos_strategy(lp, self.eos_strategy, self.blank_idx)

    def _pred_advance(self, params, tokens, h, c):
        """tokens: [B, W]; h, c: [L, B, W, Hp] -> (g, h', c')."""
        L, B, W, Hp = h.shape
        embed = params["prediction"]["embed"]
        emb = embed[jnp.clip(tokens.reshape(B * W), 0, embed.shape[0] - 1)]
        out, h2, c2 = lstm_step(
            params["prediction"]["dec_rnn"],
            emb,
            h.reshape(L, B * W, Hp),
            c.reshape(L, B * W, Hp),
            hard=self.model.cfg.hard_activations,
            quantize=self.model.cfg.quantize,
        )
        g = _linear(params["joint_pred"], out).reshape(B, W, -1)
        return g, h2.reshape(L, B, W, Hp), c2.reshape(L, B, W, Hp)

    def _decode_impl(self, params, encs, enc_lens, cap: int):
        B, T, Hj = encs.shape
        W, E, K = self.W, self.E, self.model.n_classes
        L, Hp = self.model.cfg.pred_rnn_layers, self.model.cfg.pred_n_hid

        # Initial beam: lane 0 = SOS hyp (zero pred input/state), other lanes dead.
        h0 = jnp.zeros((L, B * W, Hp), encs.dtype)
        c0 = jnp.zeros((L, B * W, Hp), encs.dtype)
        out0, h0, c0 = lstm_step(
            params["prediction"]["dec_rnn"],
            jnp.zeros((B * W, self.model.cfg.pred_n_hid), encs.dtype),
            h0, c0, hard=self.model.cfg.hard_activations,
            quantize=self.model.cfg.quantize,
        )
        g0 = _linear(params["joint_pred"], out0).reshape(B, W, Hj)
        lane = lax.broadcasted_iota(jnp.int32, (B, W), 1)
        beam = dict(
            scores=jnp.where(lane == 0, 0.0, NEG_INF),
            toks=jnp.full((B, W, cap), self.blank_idx, jnp.int32),
            ts=jnp.zeros((B, W, cap), jnp.int32),
            lens=jnp.zeros((B, W), jnp.int32),
            hash=jnp.zeros((B, W), jnp.uint32),
            g=g0,
            h=h0.reshape(L, B, W, Hp),
            c=c0.reshape(L, B, W, Hp),
        )
        if self.lm is not None:
            beam["lm"] = jnp.full((B, W), self.lm[2], jnp.int32)
        if self.kw is not None:
            beam["kw"] = jnp.full((B, W), self.kw[2], jnp.int32)

        def gather_w(tree, idx):
            return _gather_w(tree, idx, L)

        def concat_w(a, b):
            def c(x, y):
                axis = 2 if (x.ndim == 4 and x.shape[0] == L) else 1
                return jnp.concatenate([x, y], axis=axis)
            return jax.tree.map(c, a, b)

        def frame_step(carry, inp):
            beam, committed, since = carry
            f_t, t_idx = inp  # [B, Hj], scalar
            valid = t_idx < enc_lens  # [B]

            finished = dict(beam, scores=jnp.full((B, W), NEG_INF))
            active = beam

            def fin_update(finished, active, lp):
                # blank-extend actives into the finished pool (with
                # duplicate-merging: the reference's kept_hyps logaddexp,
                # beam.py:467-469)
                fin_cand = dict(
                    active, scores=active["scores"] + lp[..., self.blank_idx]
                )
                pool = concat_w(finished, fin_cand)
                if self.merge:
                    pool["scores"] = _merged_scores(
                        pool["scores"], pool["hash"], pool["lens"]
                    )
                top_s, top_i = lax.top_k(pool["scores"], W)
                finished = gather_w(pool, top_i)
                finished["scores"] = top_s
                return finished

            def expand(active, lp):
                # non-blank expansions: two-stage top-W (see the streaming
                # step below for rationale). LM/keyword fusion is applied
                # VOCAB-WIDE before the preselection — the reference fuses
                # over the whole vocabulary before pruning (beam.py:629-642),
                # and a post-preselect boost could never surface a token the
                # acoustics alone left out of the top-W
                lp_nb = lp.at[..., self.blank_idx].set(NEG_INF)
                if self.topk_thresh is not None:
                    # acoustic top-k threshold BEFORE fusion (host order:
                    # _expansion_steps prunes joint log-probs, fusion adds
                    # later; the bar includes blank — top_k runs unmasked)
                    bar = (
                        jnp.max(lp, axis=-1, keepdims=True)
                        - self.topk_thresh
                    )
                    tk_keep = lp_nb >= bar
                if self.lm is not None:
                    lp_nb = lp_nb + self.ngram_alpha * self.lm[0][active["lm"]]
                if self.kw is not None:
                    lp_nb = lp_nb + self.kw[0][active["kw"]]
                if self.topk_thresh is not None:
                    lp_nb = jnp.where(tk_keep, lp_nb, NEG_INF)
                cand_s, cand_i = lax.approx_max_k(
                    lp_nb.reshape(B * W, K), W, recall_target=0.99
                )
                cand_s = cand_s.reshape(B, W, W) + active["scores"][:, :, None]
                cand_i = cand_i.reshape(B, W, W)
                top_es, sel = lax.top_k(cand_s.reshape(B, W * W), W)
                parent = sel // W  # [B, W]
                token = jnp.take_along_axis(
                    cand_i.reshape(B, W * W), sel, axis=1
                ).astype(jnp.int32)

                new = gather_w(active, parent)
                pos = jnp.clip(new["lens"], 0, cap - 1)  # [B, W]
                bix = lax.broadcasted_iota(jnp.int32, (B, W), 0)
                wix = lax.broadcasted_iota(jnp.int32, (B, W), 1)
                new["toks"] = new["toks"].at[bix, wix, pos].set(token)
                new["ts"] = new["ts"].at[bix, wix, pos].set(t_idx)
                new["lens"] = jnp.minimum(new["lens"] + 1, cap)
                new["scores"] = top_es
                new["hash"] = _hash_step(new["hash"], token)
                if self.lm is not None:
                    new["lm"] = self.lm[1][new["lm"], token]
                if self.kw is not None:
                    new["kw"] = self.kw[1][new["kw"], token]
                new["g"], new["h"], new["c"] = self._pred_advance(
                    params, token, new["h"], new["c"]
                )
                return new

            def cond(carry):
                e, active, finished = carry
                # e < E (not E-1): the loop body's expand() is what adds a
                # token, so E iterations = at most E tokens per frame —
                # matching the host beam's per-hyp cap (_may_emit:
                # y_len_t < max_symbols). The early exit keeps the
                # expected trip count at ~1-2 regardless of E; only
                # burst-emission frames (e.g. word-level-piece models
                # emitting several tokens at once) iterate deeper.
                return (e < E) & _improvable(
                    active, finished, W, self.merge
                )

            def body(carry):
                e, active, finished = carry
                lp = self._logprobs(params, f_t, active["g"])
                finished = fin_update(finished, active, lp)
                return e + 1, expand(active, lp), finished

            # bounded early-exit loop (see _improvable): most frames emit 0-1
            # tokens, so the expected trip count is ~1-2, not E
            _, active, finished = lax.while_loop(
                cond, body, (jnp.int32(0), active, finished)
            )
            lp = self._logprobs(params, f_t, active["g"])
            finished = fin_update(finished, active, lp)

            if self.score_thresh is not None:
                finished["scores"] = _apply_score_thresh(
                    finished["scores"], finished["lens"], self.score_thresh
                )
            if self.final_emission_frames is not None and W > 1:
                s2, c2, f2 = _final_emission_prune(
                    finished["scores"], finished["toks"], finished["lens"],
                    committed, since, self.final_emission_frames,
                )
                finished["scores"] = jnp.where(
                    valid[:, None], s2, finished["scores"]
                )
                committed = jnp.where(valid, c2, committed)
                since = jnp.where(valid, f2, since)

            # padded frames leave the beam untouched
            def keep(x_new, x_old):
                extra = (1,) * (x_new.ndim - 1)
                v = valid.reshape((B,) + extra)
                if x_new.ndim == 4 and x_new.shape[0] == L:
                    v = valid.reshape((1, B) + (1,) * (x_new.ndim - 2))
                return jnp.where(v, x_new, x_old)

            out = jax.tree.map(keep, finished, beam)
            return (out, committed, since), None

        encs_t = jnp.moveaxis(encs, 1, 0)  # [T, B, Hj]
        zb = jnp.zeros((B,), jnp.int32)
        (final, _, _), _ = lax.scan(
            frame_step, (beam, zb, zb), (encs_t, jnp.arange(T))
        )

        # order lanes by length-normalised score (reference beam.py:149)
        norm = final["scores"] / jnp.maximum(final["lens"] + 1, 1).astype(jnp.float32)
        order = jnp.argsort(-norm, axis=1)
        final = gather_w(final, order)
        return final["toks"], final["ts"], final["lens"], final["scores"]

    # -------------------------------------------------------------- public
    def decode_encs(self, params, encs, enc_lens, cap: Optional[int] = None):
        if cap is None:
            cap = min(self.cap, encs.shape[1] * self.E)
        cap = max(int(cap), 1)
        toks, ts, lens, scores = self._jit_decode(params, encs, enc_lens, cap=cap)
        return (np.asarray(toks), np.asarray(ts), np.asarray(lens), np.asarray(scores))

    def decode(self, params, feats, feat_lens) -> List[Dict[int, FrameResponses]]:
        from caiman_asr_tpu.decoding.unbatch import encode_lower_batch_size

        encs, enc_lens = encode_lower_batch_size(
            self.model, params, feats, feat_lens, self.max_inputs_per_batch
        )
        toks, ts, lens, scores = self.decode_encs(params, encs, enc_lens)
        return self.build_responses(toks, ts, lens, scores)

    def build_responses(self, toks, ts, lens, scores) -> List[Dict[int, FrameResponses]]:
        """One closing final per utterance carrying the n-best beam
        (offline decode shape; streaming partial/final logic is host-side)."""
        out: List[Dict[int, FrameResponses]] = []
        B, W, _ = toks.shape
        for b in range(B):
            alts = []
            for w in range(W):
                n = int(lens[b, w])
                if scores[b, w] <= NEG_INF / 2:
                    continue
                y = [int(t) for t in toks[b, w, :n]]
                alts.append(
                    HypothesisResponse(
                        y_seq=y,
                        timesteps=[int(t) for t in ts[b, w, :n]],
                        token_seq=[
                            self.tokenizer.id_to_piece(t) if self.tokenizer else ""
                            for t in y
                        ],
                        confidence=[1.0] * n,
                    )
                )
            start = min((a.timesteps[0] for a in alts if a.timesteps), default=0)
            end = max((a.timesteps[-1] for a in alts if a.timesteps), default=0)
            resp = (
                {}
                if not alts or not alts[0].y_seq
                else {
                    end: FrameResponses(
                        partials=None,
                        final=DecodingResponse(
                            start_frame_idx=start,
                            duration_frames=end - start + 1,
                            is_provisional=False,
                            alternatives=alts,
                        ),
                    )
                }
            )
            out.append(resp)
        return out


# --------------------------------------------------------------------------
# Streaming beam step (serving): the per-frame body of FastBeamDecoder as a
# standalone state machine, so the engine can advance one 60 ms frame at a
# time with the full W-beam carried per lane.
# --------------------------------------------------------------------------
def make_streaming_beam_step(
    model: RNNT,
    blank_idx: int,
    beam_width: int = 4,
    expansions: int = 4,
    temperature: float = 1.4,
    cap: int = 256,
    ngram_lm=None,
    ngram_alpha: float = 0.0,
    keywords=None,
    merge: bool = True,
    score_thresh: Optional[float] = None,
    topk_thresh: Optional[float] = None,
    final_emission_frames: Optional[int] = None,
):
    """Returns (init_state, step).

    init_state(params, B, dtype) -> state dict with the per-lane beam:
      scores [B, W], toks/ts [B, W, cap], lens [B, W], g [B, W, Hj],
      h/c [L, B, W, Hp].
    step(params, f [B, Hj], state) -> new state (one frame advanced).

    The host derives partials (n-best buffers) and finals (common-prefix
    growth) from the buffers; streams are bounded to ``cap`` emitted tokens
    (~minutes) — long-form serving should use state resets.
    """
    W, E, K = beam_width, expansions, model.n_classes
    L, Hp = model.cfg.pred_rnn_layers, model.cfg.pred_n_hid
    lm = _lm_tables(ngram_lm, ngram_alpha)
    alpha = float(ngram_alpha)
    kw = _kw_tables(keywords)

    score_thresh = _opt_thresh(score_thresh)
    topk_thresh = _opt_thresh(topk_thresh)
    fe_limit = _opt_thresh(final_emission_frames)
    fe_limit = None if fe_limit is None or W <= 1 else int(fe_limit)

    def pred_advance(params, tokens, h, c):
        Lc, B, Wc, Hpc = h.shape
        embed = params["prediction"]["embed"]
        emb = embed[jnp.clip(tokens.reshape(B * Wc), 0, embed.shape[0] - 1)]
        out, h2, c2 = lstm_step(
            params["prediction"]["dec_rnn"], emb,
            h.reshape(Lc, B * Wc, Hpc), c.reshape(Lc, B * Wc, Hpc),
            hard=model.cfg.hard_activations,
            quantize=model.cfg.quantize,
        )
        g = _linear(params["joint_pred"], out).reshape(B, Wc, -1)
        return g, h2.reshape(Lc, B, Wc, Hpc), c2.reshape(Lc, B, Wc, Hpc)

    def gather_w(tree, idx):
        return _gather_w(tree, idx, L)

    def concat_w(a, b):
        def c(x, y):
            axis = 2 if (x.ndim == 4 and x.shape[0] == L) else 1
            return jnp.concatenate([x, y], axis=axis)
        return jax.tree.map(c, a, b)

    def init_state(params, B: int, dtype=jnp.float32):
        h0 = jnp.zeros((L, B * W, Hp), dtype)
        c0 = jnp.zeros((L, B * W, Hp), dtype)
        out0, h0, c0 = lstm_step(
            params["prediction"]["dec_rnn"],
            jnp.zeros((B * W, Hp), dtype), h0, c0,
            hard=model.cfg.hard_activations,
            quantize=model.cfg.quantize,
        )
        g0 = _linear(params["joint_pred"], out0).reshape(B, W, -1)
        lane = lax.broadcasted_iota(jnp.int32, (B, W), 1)
        st = dict(
            scores=jnp.where(lane == 0, 0.0, NEG_INF),
            toks=jnp.full((B, W, cap), blank_idx, jnp.int32),
            ts=jnp.zeros((B, W, cap), jnp.int32),
            lens=jnp.zeros((B, W), jnp.int32),
            hash=jnp.zeros((B, W), jnp.uint32),
            g=g0,
            h=h0.reshape(L, B, W, Hp),
            c=c0.reshape(L, B, W, Hp),
            frame=jnp.zeros((B,), jnp.int32),
        )
        if fe_limit is not None:
            st["committed"] = jnp.zeros((B,), jnp.int32)
            st["since_final"] = jnp.zeros((B,), jnp.int32)
        if lm is not None:
            st["lm"] = jnp.full((B, W), lm[2], jnp.int32)
        if kw is not None:
            st["kw"] = jnp.full((B, W), kw[2], jnp.int32)
        return st

    def step(params, f_t, state):
        """One frame. The [B, W, cap] token/timestamp buffers are NOT
        threaded through the expansion loop: each trip records only
        (parent, token, write-pos) backpointers, and the buffers are
        materialized ONCE after the loop by composing the chains — the
        repeated full-buffer one-hot gathers were the dominant fixed cost
        of the tick (1.5 ms/trip at B=1024 vs ~0.1 ms for the trace).
        Likewise the full log-softmax is replaced by a lazy LSE (the
        normalizer is subtracted at the two consumption points) and blank
        is excluded via top-(W+1)+filter instead of a masked [B*W, K]
        copy. Selection semantics are IDENTICAL to the buffer-carrying
        form (softmax is monotone; a filtered top-(W+1) equals top-W of
        the blank-masked array)."""
        B = f_t.shape[0]
        frame = state.pop("frame")
        committed = state.pop("committed", None)
        since = state.pop("since_final", None)
        init_toks, init_ts = state["toks"], state["ts"]
        small = {k: v for k, v in state.items() if k not in ("toks", "ts")}
        # loop trip bound = E (one expand per trip -> at most E tokens per
        # frame, HOST-equal per-hyp cap semantics — see _decode_impl.cond)
        EM = max(E, 1)
        bix = lax.broadcasted_iota(jnp.int32, (B, W), 0)
        wix = lax.broadcasted_iota(jnp.int32, (B, W), 1)

        def z_lse(params, f, g):
            """Unnormalized scaled logits + per-row LSE (lazy softmax)."""
            logits = _linear(params["joint_fc"], jax.nn.relu(f[:, None, :] + g))
            z = logits.astype(jnp.float32) / temperature
            return z, jax.nn.logsumexp(z, axis=-1)

        def fin_update(fin, fin_gen, fin_row, active, z, lse, gen):
            cand_scores = active["scores"] + z[..., blank_idx] - lse
            pool = concat_w(
                {k: fin[k] for k in fin},
                dict(active, scores=cand_scores),
            )
            if merge:
                pool["scores"] = _merged_scores(
                    pool["scores"], pool["hash"], pool["lens"]
                )
            top_s, top_i = lax.top_k(pool["scores"], W)
            new_fin = gather_w(pool, top_i)
            new_fin["scores"] = top_s
            from_fin = top_i < W
            new_gen = jnp.where(
                from_fin,
                jnp.take_along_axis(
                    jnp.concatenate([fin_gen, jnp.full_like(fin_gen, gen)], 1),
                    top_i, axis=1,
                ),
                gen,
            )
            new_row = jnp.take_along_axis(
                jnp.concatenate([fin_row, wix], axis=1), top_i, axis=1
            )
            return new_fin, new_gen, new_row

        def expand(e, active, z, lse, trace):
            # two-stage selection: TPU-native approximate top-(W+1) over
            # the raw scaled logits (softmax and the score shift are
            # monotone per row, so indices are unchanged), blank filtered
            # from the W+1 survivors, then exact top-W over W*(W+1).
            zf = z
            fused = lm is not None or kw is not None
            if topk_thresh is not None and fused:
                # acoustic top-k threshold BEFORE fusion (host order; the
                # bar includes blank). Log-prob differences equal z
                # differences (row-constant LSE), so the mask works on z;
                # it fuses into the elementwise z+boost pass XLA already
                # materializes for vocab-wide fusion.
                bar = jnp.max(z, axis=-1, keepdims=True) - topk_thresh
                zf = jnp.where(z >= bar, z, NEG_INF)
            if lm is not None:
                # vocab-wide fusion BEFORE preselection (ref beam.py:629-642):
                # the LSE is row-constant, so adding fusion scores to the
                # unnormalized z preserves the final candidate ordering
                zf = zf + alpha * lm[0][active["lm"]]
            if kw is not None:
                zf = zf + kw[0][active["kw"]]
            cs, ci = lax.approx_max_k(
                zf.reshape(B * W, K), W + 1, recall_target=0.99
            )
            if topk_thresh is not None and not fused:
                # no fusion: candidates ARE acoustic scores — threshold
                # them against the EXACT full-vocab row max (approx_max_k
                # only probabilistically contains it; using its max as the
                # bar would prune less than the offline/host decoders).
                # The extra reduce fuses with z's producer — no new pass.
                bar = (
                    jnp.max(z, axis=-1).reshape(B * W, 1) - topk_thresh
                )
                cs = jnp.where(cs >= bar, cs, NEG_INF)
            cs = jnp.where(ci == blank_idx, NEG_INF, cs)
            cand_s = (
                cs.reshape(B, W, W + 1)
                - lse[:, :, None]
                + active["scores"][:, :, None]
            )
            cand_i = ci.reshape(B, W, W + 1)
            top_es, sel = lax.top_k(cand_s.reshape(B, W * (W + 1)), W)
            parent = sel // (W + 1)
            token = jnp.take_along_axis(
                cand_i.reshape(B, W * (W + 1)), sel, axis=1
            ).astype(jnp.int32)
            new = gather_w(active, parent)
            pos = jnp.clip(new["lens"], 0, cap - 1)
            trace = (
                lax.dynamic_update_index_in_dim(trace[0], parent, e, 0),
                lax.dynamic_update_index_in_dim(trace[1], token, e, 0),
                lax.dynamic_update_index_in_dim(trace[2], pos, e, 0),
            )
            new["lens"] = jnp.minimum(new["lens"] + 1, cap)
            new["scores"] = top_es
            new["hash"] = _hash_step(new["hash"], token)
            if lm is not None:
                new["lm"] = lm[1][new["lm"], token]
            if kw is not None:
                new["kw"] = kw[1][new["kw"], token]
            new["g"], new["h"], new["c"] = pred_advance(
                params, token, new["h"], new["c"]
            )
            return new, trace

        def cond(carry):
            e, active, fin, _, _, _ = carry
            return (e < EM) & _improvable(active, fin, W, merge)

        def body(carry):
            e, active, fin, fin_gen, fin_row, trace = carry
            z, lse = z_lse(params, f_t, active["g"])
            fin, fin_gen, fin_row = fin_update(
                fin, fin_gen, fin_row, active, z, lse, e
            )
            active, trace = expand(e, active, z, lse, trace)
            return e + 1, active, fin, fin_gen, fin_row, trace

        trace0 = tuple(jnp.zeros((EM, B, W), jnp.int32) for _ in range(3))
        e_fin, active, fin, fin_gen, fin_row, trace = lax.while_loop(
            cond, body,
            (
                jnp.int32(0),
                small,
                dict(small, scores=jnp.full((B, W), NEG_INF)),
                jnp.zeros((B, W), jnp.int32),
                jnp.broadcast_to(wix, (B, W)),
                trace0,
            ),
        )
        z, lse = z_lse(params, f_t, active["g"])
        fin, fin_gen, fin_row = fin_update(
            fin, fin_gen, fin_row, active, z, lse, e_fin
        )

        # ---- materialize toks/ts: walk the backpointer chains (gens
        # e..1), then ONE buffer gather + <=EM tiny scatters
        tp, tt, tpos = trace
        row = fin_row
        writes = []
        for gg in range(EM, 0, -1):
            valid = fin_gen >= gg
            writes.append((
                jnp.take_along_axis(tpos[gg - 1], row, axis=1),
                jnp.take_along_axis(tt[gg - 1], row, axis=1),
                valid,
            ))
            row = jnp.where(
                valid, jnp.take_along_axis(tp[gg - 1], row, axis=1), row
            )
        out_toks = _gather_w({"x": init_toks}, row, L)["x"]
        out_ts = _gather_w({"x": init_ts}, row, L)["x"]
        frame_w = jnp.broadcast_to(frame[:, None], (B, W))
        # oldest generation first: at cap saturation several generations
        # clip to pos = cap-1 and the LATEST write must win (matching the
        # sequential in-loop scatters this replay replaces)
        for pos_w, tok_w, valid in reversed(writes):
            cur_t = out_toks[bix, wix, pos_w]
            cur_s = out_ts[bix, wix, pos_w]
            out_toks = out_toks.at[bix, wix, pos_w].set(
                jnp.where(valid, tok_w, cur_t)
            )
            out_ts = out_ts.at[bix, wix, pos_w].set(
                jnp.where(valid, frame_w, cur_s)
            )
        fin["toks"] = out_toks
        fin["ts"] = out_ts
        if score_thresh is not None:
            fin["scores"] = _apply_score_thresh(
                fin["scores"], fin["lens"], score_thresh
            )
        if fe_limit is not None:
            fin["scores"], fin["committed"], fin["since_final"] = (
                _final_emission_prune(
                    fin["scores"], out_toks, fin["lens"],
                    committed, since, fe_limit,
                )
            )
        fin["frame"] = frame + 1
        state["frame"] = frame  # restore caller's dict shape
        if committed is not None:
            state["committed"], state["since_final"] = committed, since
        return fin

    return init_state, step
