"""Vocab-parallel (tensor-parallel) fused joint + LSE over a mesh axis.

The joint GEMM h @ W [N, Hj]x[Hj, K] is the FLOP-dominant part of RNN-T
training. This module shards it over the vocab dimension across a ``model``
mesh axis (used inside ``shard_map``): each device holds W[:, shard], runs
the same Pallas chunk kernels as the single-chip path
(ops/pallas_joint._fwd_chunk / _bwd_*), and only three O(N) vectors cross
the ICI per step (partial sumexp, label-logit and blank-logit one-hots),
plus the [N, Hj] dh smear in the backward.

This is a capability the reference does not have (it is DP-only,
SURVEY.md 2c) — it exists to scale the large-196M/17k-vocab models: the
per-shard stored-u slab is K/n_model smaller, re-enabling the stored-u
backward (ops/pallas_joint.py) that does not fit single-chip at large K.

Layout contract (enforced by the caller / train step):
  - h, labels, cotangents: replicated over the model axis (sharded over
    ``data`` as usual).
  - w_local [Hj, K/n], b_local [K/n]: the local vocab shard, contiguous
    columns, all shards equal width (pad K to a multiple of n with NEG bias
    columns — exp -> 0 contributions, grads 0).
  - blank_idx is a GLOBAL column id.
  - differentiate INSIDE the shard_map body (jax.grad around a loss that
    calls this, as make_train_step_tp does) — NOT through the shard_map
    boundary (see the note in _vp_vjp_bwd).
Returns per-position (lp_blank, lp_label) replicated over the model axis;
grads to w_local/b_local are local (no collective), grads to h are psum'd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from caiman_asr_tpu.ops import pallas_joint as pj

MODEL_AXIS = "model"


def shard_relative_ids(ids, k_off, width):
    """(in_shard_mask, clipped_relative_ids) for GLOBAL vocab ids against
    this shard's contiguous column range [k_off, k_off + width).

    The canonical masked shard-local gather idiom: gather with the clipped
    relative id, then zero/ignore where the mask is False. Shared by the
    vocab-parallel joint (here) and the pruned loss's sharded simple heads
    (ops/pruned_loss.simple_lattice_scores) so the offset/masking contract
    lives in one place."""
    rel = ids - k_off
    ok = (rel >= 0) & (rel < width)
    return ok, jnp.clip(rel, 0, width - 1)


def _local_onehot_logits(h, w_local, b_local, labels, blank_idx, k_off):
    """Shard-local contributions of the label/blank logit extractions
    (the O(N*Hj) gathered-column dots of pallas_joint._forward)."""
    Kl = w_local.shape[1]
    b32 = b_local.astype(jnp.float32)
    lab_in, lab_c = shard_relative_ids(labels, k_off, Kl)
    w_lab = w_local.T[lab_c]  # [N, Hj]
    z_lab = (
        jnp.sum(h.astype(jnp.float32) * w_lab.astype(jnp.float32), axis=1)
        + b32[lab_c]
    )
    z_lab = jnp.where(lab_in, z_lab, 0.0)
    blank_in, blank_c = shard_relative_ids(blank_idx, k_off, Kl)
    z_blank = (
        jnp.dot(h, w_local[:, blank_c], preferred_element_type=jnp.float32)
        + b32[blank_c]
    )
    z_blank = jnp.where(blank_in, z_blank, 0.0)
    return z_blank, z_lab


def vp_joint_lse(h, w_local, b_local, labels, blank_idx,
                 axis_name=MODEL_AXIS, interpret=None):
    """Vocab-parallel fused_joint_lse; call INSIDE shard_map with
    w_local/b_local sharded on the vocab dim over ``axis_name``.
    interpret=None auto-selects Pallas interpret mode off-TPU."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _vp_joint_lse(h, w_local, b_local, labels, blank_idx,
                         axis_name, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _vp_joint_lse(h, w_local, b_local, labels, blank_idx,
                  axis_name, interpret):
    out, _ = _vp_fwd_impl(h, w_local, b_local, labels, blank_idx,
                          axis_name, interpret, store_z=False)
    return out


def _vp_fwd_impl(h, w_local, b_local, labels, blank_idx, axis_name,
                 interpret, store_z):
    N, Hj = h.shape
    Kl = w_local.shape[1]
    tp, kt, _, _, _, _ = pj._tiles(Hj)
    Np = -(-N // tp) * tp
    hp = pj._pad_to(h, Np, 0)
    Klp = -(-Kl // kt) * kt

    # TP shards the vocab, so the per-shard bf16 slab is 1/n_shards of the
    # single-device one — the full-precision dtype is kept here (the i8
    # fallback in pj._store_plan exists for the UNsharded large-vocab case)
    ks = pj._store_cols(Np, Klp, kt) if store_z else 0
    ks = min(ks, Kl)
    if ks > 0:
        s1, up, _ = pj._fwd_chunk(hp, w_local, b_local, 0, ks, tp, kt,
                                  "bf16", interpret)
        if ks < Kl:
            s2, _, _ = pj._fwd_chunk(hp, w_local, b_local, ks, Kl, tp, kt,
                                     None, interpret)
            sums_local = s1 + s2
        else:
            sums_local = s1
    else:
        sums_local, up, _ = pj._fwd_chunk(hp, w_local, b_local, 0, Kl, tp,
                                          kt, None, interpret)

    k_off = lax.axis_index(axis_name) * Kl
    zb_local, zl_local = _local_onehot_logits(
        h, w_local, b_local, labels, blank_idx, k_off
    )
    # one psum for everything that must cross shards in the forward
    sums, z_blank, z_lab = lax.psum(
        (sums_local[:N], zb_local, zl_local), axis_name
    )
    denom = jnp.log(sums)
    return (z_blank - denom, z_lab - denom), (denom, up, k_off)


def _vp_vjp_fwd(h, w_local, b_local, labels, blank_idx, axis_name, interpret):
    out, (denom, up, k_off) = _vp_fwd_impl(
        h, w_local, b_local, labels, blank_idx, axis_name, interpret,
        store_z=True,
    )
    return out, (h, w_local, b_local, labels, denom, up, k_off)


def _vp_vjp_bwd(blank_idx, axis_name, interpret, res, grads):
    h, w_local, b_local, labels, denom, up, k_off = res
    cb, cl = grads
    # CONTRACT: differentiate INSIDE the shard_map body (as
    # training/step.make_train_step_tp's grads_body does) — there the
    # cotangent arrives at full scale on every model shard, and the local
    # dW/db below ARE the final shard gradients while dh needs the psum
    # over vocab chunks. Differentiating THROUGH shard_map instead is NOT
    # supported: its transpose delivers replicated-output cotangents
    # divided by the axis size and sums replicated-input grads, which
    # cancels for dh but leaves dW/db at 1/n scale.
    # (tests/parallel/test_vocab_parallel.py verifies the supported
    # pattern against the single-device kernels.)
    N, Hj = h.shape
    Kl = w_local.shape[1]

    _, _, tp_a, kt_a, tp_b, kt_b = pj._tiles(Hj)
    Np = up.shape[0] if up is not None else -(-N // tp_a) * tp_a
    ks = min(up.shape[1], Kl) if up is not None else 0

    hp = pj._pad_to(h, Np, 0)
    dn = pj._pad_to(denom.reshape(1, N), Np, 1)
    cbp = pj._pad_to(cb.reshape(1, N).astype(jnp.float32), Np, 1)
    clp = pj._pad_to(cl.reshape(1, N).astype(jnp.float32), Np, 1)
    lab_rel = (labels - k_off).astype(jnp.int32)
    labp = pj._pad_to(lab_rel.reshape(1, N), Np, 1)
    blank_rel_t = blank_idx - k_off  # traced (k_off is axis_index-derived)
    csum = cbp + clp
    cs = csum * jnp.exp(-dn) if up is not None else None

    # pass A: shard-local smear over local vocab columns
    smear = None
    if ks > 0:
        smear = pj._bwd_a_u(up, w_local, 0, ks, cs, tp_a, kt_a, interpret)
    if ks < Kl:
        s2 = pj._bwd_a_recompute(
            hp, w_local, b_local, ks, Kl, dn, csum, tp_a, kt_a, interpret
        )
        smear = s2 if smear is None else smear + s2
    # local one-hot dh terms (w columns this shard owns); ids here are
    # ALREADY shard-relative, so offset 0 in the shared helper
    lab_in, lab_c = shard_relative_ids(lab_rel, 0, Kl)
    blank_in, blank_c = shard_relative_ids(blank_rel_t, 0, Kl)
    dh_local = (
        smear[:N]
        + jnp.where(blank_in, cb, 0.0)[:, None]
        * w_local[:, blank_c][None, :].astype(jnp.float32)
        + (jnp.where(lab_in, cl, 0.0)[:, None]
           * w_local.T[lab_c].astype(jnp.float32))
    )
    dh = lax.psum(dh_local, axis_name).astype(h.dtype)

    # pass B: dW/db are shard-local — no collective. The label one-hot
    # columns use RELATIVE ids (out-of-shard ids never match the in-tile
    # iota). The kernels' blank_idx is a STATIC python int but blank_rel is
    # traced here (k_off comes from axis_index), so the in-kernel blank
    # one-hot is disabled with -1 (never matches; the cb input still feeds
    # the smear coefficient) and the single blank column is added below as
    # a rank-1 XLA update.
    dws, dbs = [], []
    if ks > 0:
        dw1, db1 = pj._bwd_b_u(
            hp, up, cs, cbp, clp, labp, -1, tp_b, kt_b, interpret
        )
        dws.append(dw1[:, :ks])
        dbs.append(db1[:, :ks])
    if ks < Kl:
        labr2 = labp - ks
        dw2, db2 = pj._bwd_b_recompute(
            hp, w_local, b_local, ks, Kl, dn, cbp, clp, labr2, -1,
            tp_b, kt_b, interpret,
        )
        dws.append(dw2[:, : Kl - ks])
        dbs.append(db2[:, : Kl - ks])
    dw = jnp.concatenate(dws, axis=1) if len(dws) > 1 else dws[0]
    db = (jnp.concatenate(dbs, axis=1) if len(dbs) > 1 else dbs[0])[0]
    # blank one-hot: dz[:, blank] += cb  =>  dW[:, blank] += h^T cb,
    # db[blank] += sum cb (only on the shard owning the global blank column)
    onehot = jnp.zeros((Kl,), jnp.float32).at[blank_c].set(
        jnp.where(blank_in, 1.0, 0.0)
    )
    hTcb = jnp.dot(h.T.astype(jnp.float32), cb)  # [Hj]
    dw = dw + hTcb[:, None] * onehot[None, :]
    db = db + onehot * jnp.sum(cb)
    return dh, dw.astype(w_local.dtype), db.astype(b_local.dtype), None


_vp_joint_lse.defvjp(_vp_vjp_fwd, _vp_vjp_bwd)
