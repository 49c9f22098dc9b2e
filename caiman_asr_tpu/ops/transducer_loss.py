"""RNN-T (transducer) forward-backward loss, TPU-native.

Replaces the reference's CUDA wavefront kernel
(training/lib/csrc/transducer_loss.cu, wrapper
training/lib/src/rnnt_ext/transducer/loss.py) with a formulation designed for
XLA/TPU rather than a translation:

- The (t, u) lattice recursion is reorganised as a **row-wise log-space linear
  recurrence**: within a time row, ``alpha[t, u] = LSE(prev[u],
  alpha[t, u-1] + emit[t, u-1])`` is a first-order recurrence whose transition
  is an affine map in ordinary space, so it is evaluated with
  ``lax.associative_scan`` (log U depth on the VPU) while a ``lax.scan``
  advances over T. No diagonal-wavefront gather/scatter, fully static shapes.
- The backward pass is the closed-form edge-posterior gradient via
  ``jax.custom_vjp`` (the reference's fused backward,
  transducer_loss.cu:275-394). Gradients flow to the per-edge scores; the
  softmax/gather backward from scores to logits is left to XLA's autodiff,
  which emits exactly the fused ``(onehot - softmax * posterior)`` form.
- Loss modifiers match the reference semantics exactly:
  * delay penalty ``lam * ((T-1)/2 - t)`` on emit edges
    (transducer_loss.cu:55-57,158 — Eq. 19 of the delay-penalized transducer
    paper),
  * EOS penalty: an extra ``eos_lam * ((T-1)/2 - t)`` on edges emitting the
    EOS token (transducer_loss.cu:167-169),
  * star (uncertain-token) channel: emitting a ``<star>`` label costs only
    the delay penalty (independent of the logits), and blank transitions out
    of a star row cost the constant ``star_penalty``
    (transducer_loss.cu:135-141, 160-163).
- The reference packs ``[B, T, U, K]`` into ``[sum T_i(U_i+1), K]`` to save
  CUDA memory. On TPU, static shapes win: we keep dense padded inputs and
  mask. Memory is bounded instead by ``transducer_loss_from_fg``, which fuses
  the joint: it scans over T-chunks, materialising only a
  ``[B, T_chunk, U, K]`` logits slab at a time (rematerialised in backward via
  ``jax.checkpoint``) and keeping just the ``[B, T, U]`` edge scores live.
  This supersedes both apex's packed TransducerJoint and the reference's
  ``batch_split_factor`` activation-memory workaround.

Convention: ``blank_idx`` is the last vocab entry (K), matching the reference
(setup/train.py:177: ``blank_idx = tokenizer.num_labels``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e30  # Used instead of -inf to avoid inf-inf NaNs in masked lanes.


@dataclass(frozen=True)
class LossModifiers:
    """Penalty configuration (reference: rnnt/loss.py:26-38).

    delay_penalty / eos_penalty are the lambda factors of the fractional
    penalties; star_penalty is a constant log-prob for blank transitions out
    of an uncertain-label row. ``*_idx`` of -1 disables the respective token.
    """

    delay_penalty: float = 0.0
    eos_penalty: float = 0.0
    eos_idx: int = -1
    star_penalty: float = 0.0
    star_idx: int = -1


def _linrec(b: jax.Array, k: jax.Array) -> jax.Array:
    """Solve the log-space linear recurrence x[j] = LSE(b[j], x[j-1] + k[j]).

    x[0] = b[0] (k[..., 0] is ignored). In ordinary space this is the affine
    recurrence X[j] = B[j] + K[j] * X[j-1]; affine maps compose associatively:
      (k1, b1) then (k2, b2) -> (k1 + k2, LSE(b2, k2 + b1)),
    so a ``lax.associative_scan`` evaluates the whole row in O(log U) VPU
    passes instead of a U-step sequential loop.
    """
    k = jnp.concatenate([jnp.full_like(k[..., :1], NEG_INF), k[..., 1:]], axis=-1)

    def combine(x, y):
        k1, b1 = x
        k2, b2 = y
        return k1 + k2, jnp.logaddexp(b2, k2 + b1)

    _, out = lax.associative_scan(combine, (k, b), axis=-1)
    return out


def _row_update_fwd(prev: jax.Array, emit_row: jax.Array) -> jax.Array:
    """alpha row update: x[u] = LSE(prev[u], x[u-1] + emit_row[u-1])."""
    k = jnp.concatenate(
        [jnp.full_like(emit_row[..., :1], NEG_INF), emit_row[..., :-1]], axis=-1
    )
    return _linrec(prev, k)


def _row_update_bwd(nxt: jax.Array, emit_row: jax.Array) -> jax.Array:
    """beta row update: x[u] = LSE(nxt[u], x[u+1] + emit_row[u]).

    In reversed coordinates v = U-1-u this is the forward recurrence with
    coefficient k_rev[v] = emit_row[U-1-v], i.e. flip(emit_row).
    """
    rev = lambda a: jnp.flip(a, axis=-1)
    return rev(_linrec(rev(nxt), rev(emit_row)))


def _masked_scores(
    null_scores: jax.Array,
    emit_scores: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Apply validity masking and build the beta seed row.

    Rows with t >= t_len become pass-through (null = 0, emit = -inf) so that
    a single static-shape scan handles ragged batches: the beta seed at the
    virtual row t = T propagates unchanged up to the true final row.
    """
    B, T, U1 = null_scores.shape
    t_ix = lax.broadcasted_iota(jnp.int32, (B, T, U1), 1)
    u_ix = lax.broadcasted_iota(jnp.int32, (B, T, U1), 2)
    F = t_lens.astype(jnp.int32)[:, None, None]
    G = (u_lens.astype(jnp.int32) + 1)[:, None, None]

    in_t = t_ix < F
    null = jnp.where(in_t, jnp.where(u_ix < G, null_scores, NEG_INF), 0.0)
    emit = jnp.where(in_t & (u_ix < G - 1), emit_scores, NEG_INF)

    u_row = lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    seed = jnp.where(u_row == (u_lens.astype(jnp.int32) + 1)[:, None] - 1, 0.0, NEG_INF)
    return null, emit, seed


def _lattice_alpha_beta(
    null: jax.Array, emit: jax.Array, seed: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Compute alpha and beta over the masked lattice.

    null, emit: [B, T, U1] masked scores; seed: [B, U1] beta seed row.
    Returns (alpha, beta), each [B, T, U1] float32.
    """
    B, T, U1 = null.shape
    null_t = jnp.moveaxis(null, 1, 0)  # [T, B, U1]
    emit_t = jnp.moveaxis(emit, 1, 0)

    # --- alpha ---
    init_prev = jnp.where(
        lax.broadcasted_iota(jnp.int32, (B, U1), 1) == 0, 0.0, NEG_INF
    )
    a0 = _row_update_fwd(init_prev, emit_t[0])

    def alpha_step(a_prev, rows):
        null_row, emit_row = rows
        b = a_prev + null_row
        a = _row_update_fwd(b, emit_row)
        return a, a

    _, alphas = lax.scan(alpha_step, a0, (null_t[:-1], emit_t[1:]))
    alpha = jnp.concatenate([a0[None], alphas], axis=0)  # [T, B, U1]

    # --- beta ---
    def beta_step(b_next, rows):
        null_row, emit_row = rows
        nxt = null_row + b_next
        bt = _row_update_bwd(nxt, emit_row)
        return bt, bt

    _, betas = lax.scan(beta_step, seed, (null_t, emit_t), reverse=True)
    return jnp.moveaxis(alpha, 0, 1), jnp.moveaxis(betas, 0, 1)


@partial(jax.custom_vjp, nondiff_argnums=())
def rnnt_lattice(
    null_scores: jax.Array,
    emit_scores: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
) -> jax.Array:
    """Per-sample negative log-likelihood of the transducer lattice.

    Args:
      null_scores: [B, T, U+1] log-prob of the blank transition at (t, u).
      emit_scores: [B, T, U+1] log-prob of emitting label[u] at (t, u)
        (entries at u = U are ignored).
      t_lens: [B] encoder lengths (int).
      u_lens: [B] label lengths (int).

    Returns:
      loss: [B] float32, ``-log P(y | x)`` (= -beta[0, 0]).
    """
    loss, _ = _rnnt_lattice_fwd_impl(null_scores, emit_scores, t_lens, u_lens)
    return loss


def _rnnt_lattice_fwd_impl(null_scores, emit_scores, t_lens, u_lens):
    null, emit, seed = _masked_scores(
        null_scores.astype(jnp.float32), emit_scores.astype(jnp.float32), t_lens, u_lens
    )
    alpha, beta = _lattice_alpha_beta(null, emit, seed)
    loss = -beta[:, 0, 0]
    return loss, (null, emit, seed, alpha, beta, t_lens, u_lens)


def _rnnt_lattice_fwd(null_scores, emit_scores, t_lens, u_lens):
    loss, res = _rnnt_lattice_fwd_impl(null_scores, emit_scores, t_lens, u_lens)
    return loss, res


def _rnnt_lattice_bwd(res, ct):
    null, emit, seed, alpha, beta, t_lens, u_lens = res
    B, T, U1 = null.shape
    beta00 = beta[:, 0, 0][:, None, None]  # = -loss

    # beta at row t+1 (virtual row T = seed).
    beta_next = jnp.concatenate([beta[:, 1:], seed[:, None, :]], axis=1)
    # beta at column u+1 within the same row.
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF, beta.dtype)], axis=2
    )

    t_ix = lax.broadcasted_iota(jnp.int32, (B, T, U1), 1)
    u_ix = lax.broadcasted_iota(jnp.int32, (B, T, U1), 2)
    F = t_lens.astype(jnp.int32)[:, None, None]
    G = (u_lens.astype(jnp.int32) + 1)[:, None, None]

    # Edge posteriors: P(path uses edge) = exp(alpha + edge + beta_dest - beta00).
    post_null = jnp.exp(jnp.clip(alpha + null + beta_next - beta00, NEG_INF, 0.0))
    post_emit = jnp.exp(jnp.clip(alpha + emit + beta_right - beta00, NEG_INF, 0.0))

    valid_null = (t_ix < F) & (u_ix < G)
    valid_emit = (t_ix < F) & (u_ix < G - 1)
    ctb = ct[:, None, None]
    g_null = jnp.where(valid_null, -ctb * post_null, 0.0)
    g_emit = jnp.where(valid_emit, -ctb * post_emit, 0.0)
    return g_null, g_emit, None, None


rnnt_lattice.defvjp(_rnnt_lattice_fwd, _rnnt_lattice_bwd)


def joint_lattice_scores(
    logits: jax.Array,
    labels: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank_idx: int,
    mods: LossModifiers = LossModifiers(),
) -> Tuple[jax.Array, jax.Array]:
    """Build (null, emit) edge scores from dense joint logits.

    logits: [B, T, U+1, K] raw (pre-softmax). labels: [B, U] int32.
    Returns (null_scores, emit_scores): [B, T, U+1] float32.
    """
    B, T, U1, K = logits.shape
    logits32 = logits.astype(jnp.float32)
    denom = jax.nn.logsumexp(logits32, axis=-1)  # [B, T, U1]

    lp_blank = logits32[..., blank_idx] - denom

    # Gather the label log-prob at every (t, u): labels index along K.
    lab = labels.astype(jnp.int32)
    lab_padded = jnp.concatenate(
        [lab, jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, U+1]; entry at U is a dummy (emit at u=U is masked anyway)
    lp_label = (
        jnp.take_along_axis(
            logits32, jnp.broadcast_to(lab_padded[:, None, :, None], (B, T, U1, 1)), axis=-1
        ).squeeze(-1)
        - denom
    )

    t_ix = lax.broadcasted_iota(jnp.float32, (B, T, U1), 1)
    Fm1 = (t_lens.astype(jnp.float32) - 1.0)[:, None, None]
    dp = mods.delay_penalty * (Fm1 / 2.0 - t_ix)

    is_star_u = lab_padded == mods.star_idx  # [B, U+1]
    is_eos_u = lab_padded == mods.eos_idx

    emit = jnp.where(
        is_star_u[:, None, :],
        dp,
        lp_label
        + dp
        + jnp.where(is_eos_u[:, None, :], mods.eos_penalty * (Fm1 / 2.0 - t_ix), 0.0),
    )

    # Blank out of a star row (u > 0 and label[u-1] == star) costs star_penalty.
    prev_star = jnp.concatenate(
        [jnp.zeros((B, 1), bool), lab == mods.star_idx], axis=1
    )  # [B, U+1]
    null = jnp.where(prev_star[:, None, :], mods.star_penalty, lp_blank)
    return null, emit


def transducer_loss(
    logits: jax.Array,
    labels: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank_idx: int,
    mods: LossModifiers = LossModifiers(),
) -> jax.Array:
    """Dense-logits transducer loss; returns per-sample loss [B]."""
    null, emit = joint_lattice_scores(logits, labels, t_lens, u_lens, blank_idx, mods)
    return rnnt_lattice(null, emit, t_lens, u_lens)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _joint_dropout(rng, h, rate):
    """Inverted dropout on the joint hidden (reference: ReLU -> dropout ->
    joint_fc, rnnt/model.py:227-238 fused apex dropout_prob).

    custom_vjp so the backward needs neither a saved mask nor an RNG
    replay: h >= 0 post-ReLU, so the kept-and-nonzero positions of the
    OUTPUT (already a residual of the downstream joint) identify exactly
    where d(dropout . relu) is nonzero."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, h.shape)
    return jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)


def _joint_dropout_fwd(rng, h, rate):
    out = _joint_dropout(rng, h, rate)
    return out, out


def _joint_dropout_bwd(rate, out, ct):
    dh = jnp.where(out != 0, ct / (1.0 - rate), 0.0).astype(ct.dtype)
    return (None, dh)


_joint_dropout.defvjp(_joint_dropout_fwd, _joint_dropout_bwd)


def _fg_chunk_scores(
    f_chunk: jax.Array,
    g: jax.Array,
    w_fc: jax.Array,
    b_fc: jax.Array,
    labels: jax.Array,
    blank_idx: int,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Joint + reduce for one T-chunk: returns (denom, lp_blank, lp_label).

    f_chunk: [B, Tc, H]; g: [B, U+1, H]. Only the [B, Tc, U+1] reductions
    survive the chunk; the [B, Tc, U+1, K] logits slab is transient (and
    rematerialised in the backward pass under jax.checkpoint).
    """
    h = jax.nn.relu(f_chunk[:, :, None, :] + g[:, None, :, :])
    if dropout_rng is not None and dropout_rate > 0.0:
        h = _joint_dropout(dropout_rng, h, dropout_rate)
    logits = (
        jnp.dot(h, w_fc.T.astype(h.dtype), preferred_element_type=jnp.float32)
        + b_fc.astype(jnp.float32)
    )
    denom = jax.nn.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank_idx] - denom

    B, Tc, U1, K = logits.shape
    lab_padded = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    lp_label = (
        jnp.take_along_axis(
            logits, jnp.broadcast_to(lab_padded[:, None, :, None], (B, Tc, U1, 1)), axis=-1
        ).squeeze(-1)
        - denom
    )
    return lp_blank, lp_label


import os

_FUSED_JOINT = os.environ.get("CAIMAN_FUSED_JOINT", "1") != "0"


def _fused_joint_ok(H: int) -> bool:
    if not _FUSED_JOINT or H % 128 != 0:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _joint_lse(h, w_t, b, lab_flat, blank_idx, interpret, vocab_axis):
    """Dispatch to the single-device or vocab-parallel fused joint+LSE.
    Under ``vocab_axis`` (inside shard_map) w_t/b are the LOCAL vocab shard
    and blank_idx is GLOBAL (parallel/vocab_parallel.py)."""
    if vocab_axis is not None:
        from caiman_asr_tpu.parallel.vocab_parallel import vp_joint_lse

        # interpret=False means "caller didn't force interpret": let the
        # vp wrapper auto-detect (the dense fused path is TPU-gated by
        # _fused_joint_ok, but vocab_axis forces this route on any backend)
        return vp_joint_lse(h, w_t, b, lab_flat, blank_idx, vocab_axis,
                            True if interpret else None)
    from caiman_asr_tpu.ops.pallas_joint import fused_joint_lse

    return fused_joint_lse(h, w_t, b, lab_flat, blank_idx, interpret)


def _fused_joint_scores(
    f, g, w_fc, b_fc, labels, blank_idx, dropout_rng=None, dropout_rate=0.0,
    vocab_axis=None,
):
    """Pallas online-softmax joint: (lp_blank, lp_label) [B, T, U+1] without
    the [.., K] logits slab (ops/pallas_joint.py)."""
    B, T, H = f.shape
    U1 = g.shape[1]
    h = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :]).reshape(B * T * U1, H)
    if dropout_rng is not None and dropout_rate > 0.0:
        h = _joint_dropout(dropout_rng, h, dropout_rate)
    lab_padded = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    lab_flat = jnp.broadcast_to(lab_padded[:, None, :], (B, T, U1)).reshape(-1)
    lp_b, lp_l = _joint_lse(h, w_fc.T, b_fc, lab_flat, blank_idx, False,
                            vocab_axis)
    return lp_b.reshape(B, T, U1), lp_l.reshape(B, T, U1)


def _packed_joint_scores(
    f, g, w_fc, b_fc, labels, t_lens, u_lens, blank_idx,
    pack_to, dropout_rng, dropout_rate, interpret, vocab_axis=None,
):
    """Joint + LSE over only the VALID lattice positions.

    The reference packs [B, T, U+1, K] into [sum T_i(U_i+1), K] to bound
    CUDA memory (transducer_loss.cu:74-78, apex packed TransducerJoint).
    Here packing bounds COMPUTE: the O(N·K) joint GEMM + softmax (the
    dominant train-step cost) runs over ``pack_to`` rows instead of the
    dense B·T·(U+1) — on bucketed real batches a 20-40% saving. ``pack_to``
    must be static (one compile per quantised cap) and >= the true number
    of valid positions (the caller computes it host-side from the length
    metadata; see training/pack.py).

    Returns dense (lp_blank, lp_label) [B, T, U+1] with garbage at invalid
    positions (masked downstream by _masked_scores).
    """
    B, T, H = f.shape
    U1 = g.shape[1]
    N = B * T * U1

    # slot -> (b, t, u) by searchsorted over per-utterance lattice sizes
    # (packed order = (b, t, u) lexicographic, same as the reference's
    # batch_offset packing, loss.py:155-173). O(pack_to · log B), no
    # full-lattice cumsum.
    u1 = u_lens.astype(jnp.int32) + 1
    sizes = t_lens.astype(jnp.int32) * u1
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)])
    slots = jnp.arange(pack_to, dtype=jnp.int32)
    b_i = jnp.clip(
        jnp.searchsorted(off, slots, side="right").astype(jnp.int32) - 1, 0, B - 1
    )
    rem = slots - off[b_i]
    u1b = u1[b_i]
    t_i = jnp.minimum(rem // u1b, T - 1)
    u_i = jnp.minimum(rem % u1b, U1 - 1)
    valid_slot = slots < off[B]

    f2 = f.reshape(B * T, H)[b_i * T + t_i]
    g2 = g.reshape(B * U1, H)[b_i * U1 + u_i]
    h = jax.nn.relu(f2 + g2)
    if dropout_rng is not None and dropout_rate > 0.0:
        h = _joint_dropout(dropout_rng, h, dropout_rate)

    lab_padded = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    lab_flat = lab_padded.reshape(B * U1)[b_i * U1 + u_i]

    lp_b_p, lp_l_p = _joint_lse(
        h, w_fc.T.astype(h.dtype), b_fc, lab_flat, blank_idx, interpret,
        vocab_axis,
    )
    flat = jnp.where(valid_slot, (b_i * T + t_i) * U1 + u_i, N)
    # If the static cap undercounts the true valid positions (host-side
    # length-arithmetic bug), poison the scores to -inf: the loss goes
    # non-finite and the train step SKIPS the batch — never a silently
    # truncated lattice.
    overflow = off[B] > pack_to
    scat = lambda v: jnp.where(
        overflow,
        -jnp.inf,
        jnp.zeros((N + 1,), jnp.float32).at[flat].set(v, mode="drop")[:N]
        .reshape(B, T, U1),
    )
    return scat(lp_b_p), scat(lp_l_p)


def transducer_loss_from_fg(
    f: jax.Array,
    g: jax.Array,
    w_fc: jax.Array,
    b_fc: jax.Array,
    labels: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank_idx: int,
    mods: LossModifiers = LossModifiers(),
    t_chunk: int = 16,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    pack_to: Optional[int] = None,
    vocab_axis: Optional[str] = None,
) -> jax.Array:
    """Memory-bounded fused joint + transducer loss.

    Computes the loss directly from the encoder projection ``f`` [B, T, H]
    and prediction projection ``g`` [B, U+1, H] plus the final joint linear
    (``w_fc`` [K, H], ``b_fc`` [K]), without ever materialising the
    [B, T, U+1, K] logits tensor in HBM. On TPU with 128-aligned joint dims
    this routes to the Pallas online-softmax kernel (ops/pallas_joint.py);
    otherwise a T-chunked + rematerialised XLA path bounds memory. Replaces
    the reference's packed apex TransducerJoint + batch-splitting memory
    workarounds (train_utils/batch_splitting.py:54-144).
    """
    B, T, H = f.shape
    if pack_to is not None and vocab_axis is None:
        # the packed path runs the Pallas kernel (interpret off-TPU, for
        # tests); honor the same gates as the dense fused route — the
        # CAIMAN_FUSED_JOINT=0 escape hatch and the H%128 Mosaic tiling
        # requirement on real TPU — by falling back to the dense path
        # (which bounds memory via t-chunking instead of packing)
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if not _FUSED_JOINT or (on_tpu and H % 128 != 0):
            pack_to = None
    if pack_to is not None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
        lp_blank, lp_label = _packed_joint_scores(
            f, g, w_fc, b_fc, labels, t_lens, u_lens, blank_idx,
            pack_to, dropout_rng, dropout_rate, interpret, vocab_axis,
        )
        null, emit = _penalised_scores(lp_blank, lp_label, labels, t_lens, mods)
        return rnnt_lattice(null, emit, t_lens, u_lens)
    if vocab_axis is not None or _fused_joint_ok(H):
        lp_blank, lp_label = _fused_joint_scores(
            f, g, w_fc, b_fc, labels, blank_idx, dropout_rng, dropout_rate,
            vocab_axis,
        )
        null, emit = _penalised_scores(lp_blank, lp_label, labels, t_lens, mods)
        return rnnt_lattice(null, emit, t_lens, u_lens)
    Tp = -(-T // t_chunk) * t_chunk
    if Tp != T:
        f = jnp.pad(f, ((0, 0), (0, Tp - T), (0, 0)))
    n_chunks = Tp // t_chunk
    f_chunks = jnp.moveaxis(
        f.reshape(B, n_chunks, t_chunk, H), 1, 0
    )  # [n_chunks, B, Tc, H]

    if dropout_rng is not None and dropout_rate > 0.0:
        chunk_rngs = jax.random.split(dropout_rng, n_chunks)
        chunk_fn = jax.checkpoint(
            lambda fc, rng: _fg_chunk_scores(
                fc, g, w_fc, b_fc, labels, blank_idx, rng, dropout_rate
            )
        )
        scan_xs = (f_chunks, chunk_rngs)
        scan_body = lambda _, xs: (None, chunk_fn(*xs))
    else:
        chunk_fn = jax.checkpoint(
            lambda fc: _fg_chunk_scores(fc, g, w_fc, b_fc, labels, blank_idx)
        )
        scan_xs = f_chunks
        scan_body = lambda _, fc: (None, chunk_fn(fc))

    _, (lp_blank_c, lp_label_c) = lax.scan(scan_body, None, scan_xs)
    # [n_chunks, B, Tc, U1] -> [B, T, U1]
    join = lambda a: jnp.moveaxis(a, 0, 1).reshape(B, Tp, -1)[:, :T]
    lp_blank, lp_label = join(lp_blank_c), join(lp_label_c)

    null, emit = _penalised_scores(lp_blank, lp_label, labels, t_lens, mods)
    return rnnt_lattice(null, emit, t_lens, u_lens)


def _penalised_scores(lp_blank, lp_label, labels, t_lens, mods: LossModifiers):
    """Apply delay/eos/star penalties to gathered log-probs."""
    B, T, U1 = lp_blank.shape
    lab = labels.astype(jnp.int32)
    lab_padded = jnp.concatenate([lab, jnp.zeros((B, 1), jnp.int32)], axis=1)

    t_ix = lax.broadcasted_iota(jnp.float32, (B, T, U1), 1)
    Fm1 = (t_lens.astype(jnp.float32) - 1.0)[:, None, None]
    dp = mods.delay_penalty * (Fm1 / 2.0 - t_ix)

    is_star_u = lab_padded == mods.star_idx
    is_eos_u = lab_padded == mods.eos_idx
    emit = jnp.where(
        is_star_u[:, None, :],
        dp,
        lp_label
        + dp
        + jnp.where(is_eos_u[:, None, :], mods.eos_penalty * (Fm1 / 2.0 - t_ix), 0.0),
    )
    prev_star = jnp.concatenate([jnp.zeros((B, 1), bool), lab == mods.star_idx], axis=1)
    null = jnp.where(prev_star[:, None, :], mods.star_penalty, lp_blank)
    return null, emit


class TransducerLoss:
    """API wrapper mirroring the reference's ``TransducerLoss``
    (lib/src/rnnt_ext/transducer/loss.py:43) with TPU-native internals."""

    def __init__(self, blank_idx: int, mods: LossModifiers = LossModifiers()):
        self.blank_idx = blank_idx
        self.mods = mods

    def __call__(
        self,
        logits: jax.Array,
        labels: jax.Array,
        logit_lens: jax.Array,
        label_lens: jax.Array,
        mods: Optional[LossModifiers] = None,
    ) -> jax.Array:
        return transducer_loss(
            logits, labels, logit_lens, label_lens, self.blank_idx, mods or self.mods
        )
