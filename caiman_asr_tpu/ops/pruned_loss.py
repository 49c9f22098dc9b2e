"""Pruned transducer loss (opt-in speed mode, beyond the reference).

Implements the two-stage pruned RNN-T objective of "Pruned RNN-T for fast,
memory-efficient ASR training" (Kuang et al., Interspeech 2022 — the
k2/icefall `rnnt_loss_smoothed` + `rnnt_loss_pruned` recipe), redesigned
for TPU rather than ported:

1. **Simple (factored) loss** — a trivial joint ``z[t, u, k] = am[t, k] +
   lm[u, k]`` built from two cheap vocab projections. Its log-softmax
   normaliser factorises into ONE MXU GEMM::

       LSE_k(am[t] + lm[u]) = amax[t] + lmax[u]
                            + log( exp(am[t]-amax[t]) . exp(lm[u]-lmax[u]) )

   so the whole [B, T, U+1] normaliser costs 2.B.T.U1.K FLOPs — the full
   joint's cost divided by the joint hidden width (~1000x). The per-cell
   blank/label log-probs feed the existing associative-scan lattice
   (``ops/transducer_loss.rnnt_lattice``) unchanged.

2. **Pruning bounds** — the simple lattice's emit-edge posteriors say
   where probability mass lives; for every t we keep a width-``S`` label
   window ``[s_t, s_t + S)``: monotone in t, adjacent increments <= S-1
   (so blank edges between consecutive rows stay inside both bands),
   pinned to u=0 at t=0 and covering u=U at the last valid frame.

3. **Banded full loss** — the real joint runs only on banded positions:
   ``B.T.S`` rows instead of ``B.T.(U+1)`` through the fused Pallas
   joint+LSE kernel (ops/pallas_joint.py) — a U1/S (~10-25x) FLOP and
   memory cut on the dominant train-step cost. The banded lattice
   recursion is the same row-wise log-space linear recurrence as the
   dense one: within a row, emit edges stay local (u-1 -> u maps to
   j-1 -> j); across rows, the blank edge shifts band coordinates by
   ``d_t = s_t - s_{t-1}`` (a static-shape S-axis shift). Backward is the
   closed-form edge-posterior custom VJP, as in the dense path.

Training objective (icefall convention)::

    loss = simple_scale * simple_loss + pruned_loss

The reference has no analogue (its CUDA loss is always dense/packed:
training/lib/csrc/transducer_loss.cu); this is a strictly additional
speed mode — ``--pruned_loss_range 0`` (default) keeps the exact dense
loss. Loss modifiers (delay/EOS/star, reference rnnt/loss.py:26-38
semantics) apply in both stages.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from caiman_asr_tpu.ops.transducer_loss import (
    NEG_INF,
    LossModifiers,
    _joint_dropout,
    _joint_lse,
    _lattice_alpha_beta,
    _masked_scores,
    _penalised_scores,
    _row_update_bwd,
    _row_update_fwd,
    rnnt_lattice,
)


# --------------------------------------------------------------------------
# shard_map collective helpers with explicit cotangent rules
# --------------------------------------------------------------------------
# Under shard_map(check_vma=False) a bare lax.psum is transposed to another
# psum, scaling the cotangent by the axis size; and shard-local partial
# contributions to replicated operands are never reduced. These two wrappers
# pin the correct reverse rules (the same contract vp_joint_lse's custom VJP
# implements for the dense path):
#   _psum_keep_ct:  y = sum_shards(x)   => dL/dx_local = dL/dy  (identity)
#   _ident_psum_ct: y = x (replicated)  => dL/dx = psum(partial cotangents)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_keep_ct(x, axis_name):
    return lax.psum(x, axis_name)


def _psum_keep_ct_fwd(x, axis_name):
    return lax.psum(x, axis_name), None


def _psum_keep_ct_bwd(axis_name, _, ct):
    return (ct,)


_psum_keep_ct.defvjp(_psum_keep_ct_fwd, _psum_keep_ct_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ident_psum_ct(x, axis_name):
    return x


def _ident_psum_ct_fwd(x, axis_name):
    return x, None


def _ident_psum_ct_bwd(axis_name, _, ct):
    return (lax.psum(ct, axis_name),)


_ident_psum_ct.defvjp(_ident_psum_ct_fwd, _ident_psum_ct_bwd)


# --------------------------------------------------------------------------
# Stage 1: simple (factored) joint loss
# --------------------------------------------------------------------------


def init_simple_params(key: jax.Array, joint_hid: int, n_classes: int):
    """Training-only projections for the simple loss: am/lm heads mapping
    the joint-space encoder/prediction activations to vocab logits.
    Stripped from serving exports (they only produce pruning bounds and
    the auxiliary loss)."""
    k1, k2 = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(joint_hid)
    mk = lambda k: {
        "w": jax.random.uniform(
            k, (n_classes, joint_hid), jnp.float32, -scale, scale
        ),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    return {"simple_am": mk(k1), "simple_lm": mk(k2)}


def simple_lattice_scores(
    am: jax.Array,
    lm: jax.Array,
    labels: jax.Array,
    blank_idx: int,
    vocab_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-cell (lp_blank, lp_label) [B, T, U+1] of the factored joint.

    am: [B, T, K]; lm: [B, U+1, K]; labels: [B, U] int32. The normaliser
    is one batched GEMM (see module docstring).

    Under ``vocab_axis`` (inside shard_map) am/lm are the LOCAL vocab
    shard [.., K/n] and blank_idx/labels are GLOBAL ids: the normaliser
    GEMM runs shard-local and one psum merges (sumexp, label, blank)
    contributions — the same wire pattern as vocab_parallel.vp_joint_lse."""
    am = am.astype(jnp.float32)
    lm = lm.astype(jnp.float32)
    B, T, Kl = am.shape
    U1 = lm.shape[1]

    # max-subtraction offsets: stability only — stop_gradient'd so autodiff
    # takes the plain-softmax path (the offsets cancel analytically)
    # (stop_gradient BEFORE pmax: pmax has no differentiation rule)
    amax = lax.stop_gradient(jnp.max(am, axis=-1))  # [B, T]
    lmax = lax.stop_gradient(jnp.max(lm, axis=-1))  # [B, U1]
    if vocab_axis is not None:
        amax = lax.pmax(amax, vocab_axis)
        lmax = lax.pmax(lmax, vocab_axis)
    ea = jnp.exp(am - amax[..., None])
    el = jnp.exp(lm - lmax[..., None])
    ssum = jnp.einsum(
        "btk,buk->btu", ea, el, preferred_element_type=jnp.float32
    )

    lab_padded = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, U+1]
    if vocab_axis is None:
        am_y = jnp.take_along_axis(
            am, jnp.broadcast_to(lab_padded[:, None, :], (B, T, U1)), axis=2
        )  # am at column u's label: [B, T, U1]
        lm_y = jnp.take_along_axis(lm, lab_padded[:, :, None], axis=2)[..., 0]
        am_b = am[..., blank_idx]
        lm_b = lm[..., blank_idx]
    else:
        from caiman_asr_tpu.parallel.vocab_parallel import shard_relative_ids

        k_off = lax.axis_index(vocab_axis) * Kl
        lab_in, lab_c = shard_relative_ids(lab_padded, k_off, Kl)
        am_y = jnp.where(
            lab_in[:, None, :],
            jnp.take_along_axis(
                am, jnp.broadcast_to(lab_c[:, None, :], (B, T, U1)), axis=2
            ),
            0.0,
        )
        lm_y = jnp.where(
            lab_in,
            jnp.take_along_axis(lm, lab_c[:, :, None], axis=2)[..., 0],
            0.0,
        )
        blank_in, blank_c = shard_relative_ids(blank_idx, k_off, Kl)
        am_b = jnp.where(blank_in, am[..., blank_c], 0.0)
        lm_b = jnp.where(blank_in, lm[..., blank_c], 0.0)
        ssum, am_y, lm_y, am_b, lm_b = _psum_keep_ct(
            (ssum, am_y, lm_y, am_b, lm_b), vocab_axis
        )

    norm = (
        jnp.log(jnp.maximum(ssum, 1e-30))
        + amax[:, :, None]
        + lmax[:, None, :]
    )
    lp_label = am_y + lm_y[:, None, :] - norm
    lp_blank = am_b[:, :, None] + lm_b[:, None, :] - norm
    return lp_blank, lp_label


# --------------------------------------------------------------------------
# Stage 2: pruning bounds from the simple lattice's emit posteriors
# --------------------------------------------------------------------------


def emit_posteriors(null, emit, t_lens, u_lens) -> jax.Array:
    """Emit-edge occupation probabilities of the (masked) lattice,
    [B, T, U+1] — the dense backward's ``post_emit`` without a grad call."""
    nullm, emitm, seed = _masked_scores(null, emit, t_lens, u_lens)
    alpha, beta = _lattice_alpha_beta(nullm, emitm, seed)
    B, T, U1 = nullm.shape
    beta00 = beta[:, 0, 0][:, None, None]
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF, beta.dtype)], axis=2
    )
    return jnp.exp(jnp.clip(alpha + emitm + beta_right - beta00, NEG_INF, 0.0))


def prune_ranges(
    y_grad: jax.Array, t_lens: jax.Array, u_lens: jax.Array, S: int
) -> jax.Array:
    """Monotone width-S label windows [B, T] (start index s_t per frame).

    Per frame, start at the window maximising emit-posterior mass, then
    project onto the feasible set: 0 <= s_t <= max(0, u_len+1-S), s_0 = 0,
    non-decreasing with adjacent increments <= S-1 (blank edges between
    consecutive rows stay inside both bands), and the last valid frame's
    window covers u = u_len (k2 get_rnnt_prune_ranges semantics, reshaped
    as two lax.scans instead of per-sequence host loops)."""
    B, T, U1 = y_grad.shape
    y = jnp.where(jnp.isfinite(y_grad), y_grad, 0.0)
    # sliding window mass: ws[b, t, s] = sum_{j<S} y[b, t, s+j]
    cs = jnp.cumsum(jnp.pad(y, ((0, 0), (0, 0), (1, S))), axis=2)
    ws = cs[:, :, S : S + U1] - cs[:, :, :U1]  # [B, T, U1]
    best = jnp.argmax(ws, axis=2).astype(jnp.int32)  # [B, T]

    smax = jnp.maximum(u_lens.astype(jnp.int32) + 1 - S, 0)  # [B]
    best = jnp.clip(best, 0, smax[:, None])

    # pin endpoints: s_0 = 0; frames at/after the last valid frame hold
    # smax, so the final band covers u = u_len and padded rows shift by
    # d = 0 (pass-through in the banded recursion).
    t_ix = lax.broadcasted_iota(jnp.int32, (B, T), 1)
    last = jnp.maximum(t_lens.astype(jnp.int32) - 1, 0)[:, None]
    best = jnp.where(t_ix >= last, smax[:, None], best)
    best = jnp.where(t_ix == 0, 0, best)

    # forward projection: non-decreasing, increments <= S-1
    def fwd(prev, b_t):
        s = jnp.clip(b_t, prev, prev + (S - 1))
        return s, s

    _, s_fwd = lax.scan(fwd, jnp.zeros((B,), jnp.int32), jnp.moveaxis(best, 1, 0))
    # backward projection: keep the pinned endpoint reachable
    # (s_t >= s_{t+1} - (S-1)) without breaking monotonicity (s_t <= s_{t+1})
    def bwd(nxt, s_t):
        s = jnp.clip(s_t, nxt - (S - 1), nxt)
        return s, s

    _, s_bwd = lax.scan(bwd, s_fwd[-1], s_fwd, reverse=True)
    s = jnp.moveaxis(s_bwd, 0, 1)
    s = jnp.where(t_ix == 0, 0, s)
    return jnp.clip(s, 0, smax[:, None])


# --------------------------------------------------------------------------
# Stage 3: banded lattice loss
# --------------------------------------------------------------------------


def _band_shift(row: jax.Array, d: jax.Array) -> jax.Array:
    """out[:, j] = row[:, j + d] with out-of-range -> NEG_INF.

    row: [B, S]; d: [B] int32 (may be negative). S is tiny (4-16): a
    clipped take_along_axis + mask keeps it vector-friendly."""
    B, S = row.shape
    j = lax.broadcasted_iota(jnp.int32, (B, S), 1)
    src = j + d[:, None]
    out = jnp.take_along_axis(row, jnp.clip(src, 0, S - 1), axis=1)
    return jnp.where((src >= 0) & (src < S), out, NEG_INF)


def _banded_masked_scores(null, emit, ranges, t_lens, u_lens):
    """Masking in band coordinates (mirrors _masked_scores).

    null/emit: [B, T, S] raw scores at u = ranges[b, t] + j. Valid rows
    (t < t_len): null needs u <= u_len, emit needs u < u_len. Padded rows
    pass through (null = 0, emit = -inf); prune_ranges pins their start
    to smax so d = 0 there. Seed: 0 at j with ranges[last] + j == u_len."""
    B, T, S = null.shape
    t_ix = lax.broadcasted_iota(jnp.int32, (B, T, S), 1)
    j_ix = lax.broadcasted_iota(jnp.int32, (B, T, S), 2)
    u_ix = ranges[:, :, None] + j_ix
    F = t_lens.astype(jnp.int32)[:, None, None]
    UL = u_lens.astype(jnp.int32)[:, None, None]

    in_t = t_ix < F
    nullm = jnp.where(in_t, jnp.where(u_ix <= UL, null, NEG_INF), 0.0)
    emitm = jnp.where(in_t & (u_ix < UL), emit, NEG_INF)

    last = jnp.maximum(t_lens.astype(jnp.int32) - 1, 0)
    s_last = jnp.take_along_axis(ranges, last[:, None], axis=1)  # [B, 1]
    j_row = lax.broadcasted_iota(jnp.int32, (B, S), 1)
    seed = jnp.where(
        s_last + j_row == u_lens.astype(jnp.int32)[:, None], 0.0, NEG_INF
    )
    return nullm, emitm, seed


def _banded_alpha_beta(nullm, emitm, seed, d):
    """alpha/beta over the banded lattice.

    nullm/emitm: [B, T, S] masked; seed: [B, S]; d: [B, T] band shifts
    (d[:, 0] = 0). Returns (alpha, beta), each [B, T, S] float32."""
    B, T, S = nullm.shape
    null_t = jnp.moveaxis(nullm, 1, 0)  # [T, B, S]
    emit_t = jnp.moveaxis(emitm, 1, 0)
    d_t = jnp.moveaxis(d, 1, 0)  # [T, B]

    init_prev = jnp.where(
        lax.broadcasted_iota(jnp.int32, (B, S), 1) == 0, 0.0, NEG_INF
    )
    a0 = _row_update_fwd(init_prev, emit_t[0])

    def alpha_step(a_prev, rows):
        null_row_prev, emit_row, d_row = rows
        # blank edge (t-1, u) -> (t, u): in band coords j <- j + d_t
        b = _band_shift(a_prev + null_row_prev, d_row)
        a = _row_update_fwd(b, emit_row)
        return a, a

    _, alphas = lax.scan(alpha_step, a0, (null_t[:-1], emit_t[1:], d_t[1:]))
    alpha = jnp.concatenate([a0[None], alphas], axis=0)

    def beta_step(b_next, rows):
        null_row, emit_row, d_next = rows
        # beta_next arrives in row t+1's coords; row t's cell j sits at
        # j - d_{t+1} there.
        nxt = null_row + _band_shift(b_next, -d_next)
        bt = _row_update_bwd(nxt, emit_row)
        return bt, bt

    # virtual row T = seed, reached with d = 0 (prune_ranges pins the tail)
    d_next_seq = jnp.concatenate(
        [d_t[1:], jnp.zeros((1, B), jnp.int32)], axis=0
    )
    _, betas = lax.scan(
        beta_step, seed, (null_t, emit_t, d_next_seq), reverse=True
    )
    return jnp.moveaxis(alpha, 0, 1), jnp.moveaxis(betas, 0, 1)


@partial(jax.custom_vjp, nondiff_argnums=())
def banded_rnnt_lattice(null, emit, ranges, t_lens, u_lens):
    """Per-sample NLL of the banded transducer lattice.

    null/emit: [B, T, S] blank/label log-probs at u = ranges[b, t] + j;
    ranges: [B, T] int32 monotone window starts (``prune_ranges``).
    Returns [B] = -log P(paths inside the band). With a band covering the
    full lattice (S >= U+1) this equals ``rnnt_lattice`` exactly."""
    loss, _ = _banded_fwd_impl(null, emit, ranges, t_lens, u_lens)
    return loss


def _banded_fwd_impl(null, emit, ranges, t_lens, u_lens):
    nullm, emitm, seed = _banded_masked_scores(
        null.astype(jnp.float32), emit.astype(jnp.float32),
        ranges, t_lens, u_lens,
    )
    d = jnp.diff(ranges, axis=1, prepend=ranges[:, :1])  # [B, T], d[:, 0]=0
    alpha, beta = _banded_alpha_beta(nullm, emitm, seed, d)
    loss = -beta[:, 0, 0]
    return loss, (nullm, emitm, seed, alpha, beta, d, t_lens)


def _banded_fwd(null, emit, ranges, t_lens, u_lens):
    return _banded_fwd_impl(null, emit, ranges, t_lens, u_lens)


def _banded_bwd(res, ct):
    nullm, emitm, seed, alpha, beta, d, t_lens = res
    B, T, S = nullm.shape
    beta00 = beta[:, 0, 0][:, None, None]

    # beta at the blank-edge destination (t+1, same u): shift row t+1's
    # beta into row t's coords (j - d_{t+1}); virtual row T = seed.
    d_next = jnp.concatenate([d[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    beta_rows = jnp.concatenate([beta[:, 1:], seed[:, None, :]], axis=1)
    beta_next = jax.vmap(
        lambda r, dd: _band_shift(r, -dd), in_axes=(1, 1), out_axes=1
    )(beta_rows, d_next)
    # beta at the emit-edge destination (t, j+1)
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF, beta.dtype)], axis=2
    )

    post_null = jnp.exp(jnp.clip(alpha + nullm + beta_next - beta00, NEG_INF, 0.0))
    post_emit = jnp.exp(jnp.clip(alpha + emitm + beta_right - beta00, NEG_INF, 0.0))

    # padded/pass-through rows must not leak gradient
    t_ix = lax.broadcasted_iota(jnp.int32, (B, T, S), 1)
    valid = t_ix < t_lens.astype(jnp.int32)[:, None, None]
    ctb = ct[:, None, None]
    g_null = jnp.where(valid, -ctb * post_null, 0.0)
    g_emit = jnp.where(valid, -ctb * post_emit, 0.0)
    return g_null, g_emit, None, None, None


banded_rnnt_lattice.defvjp(_banded_fwd, _banded_bwd)


# --------------------------------------------------------------------------
# Full pruned objective from (f, g)
# --------------------------------------------------------------------------


def _simple_stage(f32, g32, simple_params, labels, t_lens, u_lens,
                  blank_idx: int, mods: LossModifiers,
                  vocab_axis: Optional[str] = None):
    """Simple loss + per-cell scores. Wrapped in jax.checkpoint by the
    caller: the [B, T, K] am / exp(am) tensors are transient in both
    passes (recomputed in backward), never residuals. Under vocab_axis
    the simple heads are the local vocab shard (K/n rows); each shard's
    f/g cotangent is the partial through its local head rows, so it is
    psum'd (the dh smear of vocab_parallel._vp_vjp_bwd, here for am/lm)."""
    if vocab_axis is not None:
        f32 = _ident_psum_ct(f32, vocab_axis)
        g32 = _ident_psum_ct(g32, vocab_axis)
    am = (
        jnp.einsum(
            "bth,kh->btk",
            f32.astype(jnp.bfloat16),
            simple_params["simple_am"]["w"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + simple_params["simple_am"]["b"]
    )
    lm = (
        jnp.einsum(
            "buh,kh->buk",
            g32.astype(jnp.bfloat16),
            simple_params["simple_lm"]["w"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + simple_params["simple_lm"]["b"]
    )
    lp_blank_s, lp_label_s = simple_lattice_scores(
        am, lm, labels, blank_idx, vocab_axis
    )
    null_s, emit_s = _penalised_scores(lp_blank_s, lp_label_s, labels, t_lens, mods)
    simple_loss = rnnt_lattice(null_s, emit_s, t_lens, u_lens)
    return simple_loss, lax.stop_gradient(null_s), lax.stop_gradient(emit_s)


def pruned_transducer_loss_from_fg(
    f: jax.Array,
    g: jax.Array,
    w_fc: jax.Array,
    b_fc: jax.Array,
    simple_params,
    labels: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank_idx: int,
    mods: LossModifiers = LossModifiers(),
    prune_range: int = 5,
    simple_scale: float = 0.5,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    vocab_axis: Optional[str] = None,
) -> jax.Array:
    """Two-stage pruned transducer loss; per-utterance [B].

    ``simple_scale * simple + pruned`` (icefall convention). Stage cost vs
    the dense loss: simple ~= dense/H_joint, pruned ~= dense * S/(U+1).

    Under ``vocab_axis`` (inside shard_map, as make_train_step_tp runs):
    w_fc/b_fc and the simple heads are the LOCAL vocab shards; blank_idx
    and labels are global; the banded stage routes through the
    vocab-parallel fused joint (parallel/vocab_parallel.py).
    """
    B, T, H = f.shape
    U1 = g.shape[1]
    S = min(prune_range, U1)

    simple_loss, null_s, emit_s = jax.checkpoint(
        partial(_simple_stage, blank_idx=blank_idx, mods=mods,
                vocab_axis=vocab_axis)
    )(f, g, simple_params, labels, t_lens, u_lens)

    # pruning bounds from the simple posteriors (integer; no grads)
    y_grad = emit_posteriors(null_s, emit_s, t_lens, u_lens)
    ranges = prune_ranges(y_grad, t_lens, u_lens, S)

    # ---- banded full joint via the fused Pallas joint+LSE ----
    lab_padded = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, U+1]
    j_ix = lax.broadcasted_iota(jnp.int32, (B, T, S), 2)
    u_band = jnp.clip(ranges[:, :, None] + j_ix, 0, U1 - 1)  # [B, T, S]
    lab_band = jnp.take_along_axis(lab_padded[:, None, :], u_band, axis=2)
    # previous-row label for the star-null rule: label[u-1] == star and
    # u > 0 (an explicit u>0 mask — a sentinel value would collide with the
    # disabled star_idx = -1)
    prev_star = (u_band > 0) & (
        jnp.take_along_axis(
            lab_padded[:, None, :], jnp.maximum(u_band - 1, 0), axis=2
        )
        == mods.star_idx
    )

    # row-gather g over the band (one flat gather, as the packed path does)
    row_ix = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * U1 + u_band.reshape(B, T * S)
    ).reshape(-1)
    g_band = g.reshape(B * U1, H)[row_ix].reshape(B, T, S, H)
    h = jax.nn.relu(f[:, :, None, :] + g_band).reshape(B * T * S, H)
    if dropout_rng is not None and dropout_rate > 0.0:
        h = _joint_dropout(dropout_rng, h, dropout_rate)

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if vocab_axis is not None or H % 128 == 0:
        lp_b_flat, lp_l_flat = _joint_lse(
            h, w_fc.T, b_fc, lab_band.reshape(-1), blank_idx,
            not on_tpu, vocab_axis,
        )
    else:
        logits = (
            jnp.dot(h, w_fc.T.astype(h.dtype),
                    preferred_element_type=jnp.float32)
            + b_fc.astype(jnp.float32)
        )
        denom = jax.nn.logsumexp(logits, axis=-1)
        lp_b_flat = logits[:, blank_idx] - denom
        lp_l_flat = (
            jnp.take_along_axis(logits, lab_band.reshape(-1, 1), axis=1)[:, 0]
            - denom
        )
    lp_blank = lp_b_flat.reshape(B, T, S)
    lp_label = lp_l_flat.reshape(B, T, S)

    # penalties in band coordinates (same semantics as _penalised_scores)
    t_ixf = lax.broadcasted_iota(jnp.float32, (B, T, S), 1)
    Fm1 = (t_lens.astype(jnp.float32) - 1.0)[:, None, None]
    dp = mods.delay_penalty * (Fm1 / 2.0 - t_ixf)
    is_star = lab_band == mods.star_idx
    is_eos = lab_band == mods.eos_idx
    emit = jnp.where(
        is_star,
        dp,
        lp_label + dp
        + jnp.where(is_eos, mods.eos_penalty * (Fm1 / 2.0 - t_ixf), 0.0),
    )
    null = jnp.where(prev_star, mods.star_penalty, lp_blank)

    pruned_loss = banded_rnnt_lattice(null, emit, ranges, t_lens, u_lens)
    return simple_scale * simple_loss + pruned_loss
