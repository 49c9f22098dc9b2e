"""Wavefront multi-layer LSTM Pallas kernel (explored alternative —
MEASURED SLOWER than the per-layer kernel; not on the default path).

v5e A/B (2026-08-20, G=2, H=1536, B=96, T=200, t_blk=4):
forward 13.13 ms vs the per-layer kernel's 10.63 (0.81x), fwd+bwd
45.5 vs 26.0 (0.57x). The negative result is itself informative: the
bet was that interleaving G independent (matmul -> gate-math) chains
would fill MXU idle slots, but at M=B<=128 the sequential per-step
matmul is already near the MXU's row-utilization ceiling — the TPU
core's single issue pipeline leaves no large bubble to fill — and the
wavefront additionally moves the inner layers' input projections out of
the big MXU-efficient [T*B, H] x [H, 4H] outside GEMM into the M=B
loop, which costs more than the interleaving recovers. Kept (with
parity tests) as the measured record of the (layer, time)-pipelining
design point; the per-layer kernel in ops/pallas_lstm.py remains the
production path.

Original design rationale below.

The per-layer recurrence kernel (ops/pallas_lstm.py) is bound by its
sequential dependency chain: every timestep is one [B, H] x [H, 4H] MXU
matmul whose result feeds VPU gate math that the NEXT matmul waits on
(the reference hits the same wall per layer in CUDA,
lib/csrc/lstm.cu:259-271, and does not pipeline across layers either).

This kernel runs G same-width stacked layers as a (layer, time)
*wavefront*: at superstep ``s`` layer ``l`` processes timestep
``t = s - l``. The G (matmul -> gate-math) chains inside one superstep
are mutually independent — layer l's step-t matmul needs only its own
t-1 state and layer l-1's step-t output, both produced at superstep
``s-1`` — so Mosaic overlaps one layer's MXU matmul with another's VPU
gate math and keeps the systolic array fed.

Layout trick: every streamed array for layer ``l`` is stored shifted by
``l`` positions along the superstep axis (position ``p`` holds timestep
``p - l``), so all layers address the SAME grid block and Pallas's
automatic block double-buffering applies unchanged. Valid windows are
enforced with per-(sub-step, layer) ``@pl.when`` guards; positions
outside a layer's [l, T+l) window are garbage and sliced off on the
host side.

Weights stay VMEM-resident for the whole sequence:
- layer 0 of the group consumes a precomputed ``gates_x`` stream (its
  input projection is one big MXU-efficient [T*B, I] x [I, 4H] GEMM
  outside, any input width I) and keeps ``w_hh`` [H, 4H] resident;
- layers 1..G-1 read the previous layer's hidden state from VMEM and
  compute their FULL pre-activations in one [B, 2H] x [2H, 4H] matmul
  against the resident stack [w_ih ; w_hh] — the x-projection GEMM, its
  HBM round-trip, and the gates stream all disappear for inner layers
  (2x arithmetic intensity per issued matmul).

Inter-layer dropout runs INSIDE the kernel on the handoff (h * mask;
masks precomputed outside with exactly the ``run_lstm`` RNG stream so
training is reproducible across kernel choices); the streamed ``ys``
stay raw, matching run_lstm's all_h contract (dropout lives on the
consumer path only).

Backward is the mirrored reverse wavefront (layer l at superstep
``(T-1-t) + (G-1-l)``): ``dgates^l_t`` needs ``dgates^{l+1}_t`` (layer
above, same t) and ``dgates^l_{t+1}`` (own future) — both produced one
superstep earlier. Without dropout both backprop matmuls fold into one
[B, 8H] x [8H, H] product against the resident [w_hh^l ; w_ih^{l+1}]
stack; with dropout the from-above product is masked elementwise on its
[B, H] output, so the two matmuls stay separate (still independent MXU
work). dW/db come from big [T*B, .] GEMMs outside over the streamed
dgates, exactly like the single-layer kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caiman_asr_tpu.ops.lstm import _gate_math, hard_sigmoid, hard_tanh
from caiman_asr_tpu.ops.pallas_lstm import VMEM_BUDGET, _compiler_params


# --------------------------------------------------------------- forward
def _fwd_kernel(
    gx_ref, bias_ref, w0_hbm, *rest, hard, t_blk, G, T, n_masks, store_gates,
):
    nw = G - 1
    wcat_hbm = rest[:nw]
    mask_refs = rest[nw : nw + n_masks]
    h0_ref, c0_ref = rest[nw + n_masks], rest[nw + n_masks + 1]
    outs = rest[nw + n_masks + 2 :]
    ys_ref, cs_ref = outs[0], outs[1]
    gs_ref = outs[2] if store_gates else None
    scr = outs[3 if store_gates else 2 :]
    h_scr, c_scr, w0_scr = scr[0], scr[1], scr[2]
    wcat_scr = list(scr[3 : 3 + nw])
    sems = scr[3 + nw]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        # weights HBM -> VMEM exactly once, resident for the whole grid
        srcs = [w0_hbm] + list(wcat_hbm)
        dsts = [w0_scr] + wcat_scr
        for i in range(G):
            pltpu.make_async_copy(srcs[i], dsts[i], sems.at[i]).start()
        for i in range(G):
            pltpu.make_async_copy(srcs[i], dsts[i], sems.at[i]).wait()

    pid = pl.program_id(0)

    def superstep(i, _):
        s = pid * t_blk + i
        # snapshot ALL cross-layer handoffs (start-of-superstep values)
        h_prev_all = [h_scr[l].astype(w0_scr.dtype) for l in range(G)]
        # the G independent matmuls, issued back to back
        gates_all = []
        for l in range(G):
            if l == 0:
                g = gx_ref[i].astype(jnp.float32) + jnp.dot(
                    h_prev_all[0], w0_scr[:],
                    preferred_element_type=jnp.float32,
                )
            else:
                x_in = h_prev_all[l - 1]
                if mask_refs:
                    x_in = x_in * mask_refs[l - 1][i].astype(x_in.dtype)
                xin = jnp.concatenate([x_in, h_prev_all[l]], axis=-1)
                g = (
                    jnp.dot(xin, wcat_scr[l - 1][:],
                            preferred_element_type=jnp.float32)
                    + bias_ref[l - 1]
                )
            gates_all.append(g)
        # gate math + state/output writes, each guarded to its window
        for l in range(G):
            @pl.when((s >= l) & (s < T + l))
            def _(l=l):
                h_new, c_new = _gate_math(gates_all[l], c_scr[l], hard)
                h_scr[l] = h_new
                c_scr[l] = c_new
                ys_ref[i, l] = h_new.astype(ys_ref.dtype)
                cs_ref[i, l] = c_new.astype(cs_ref.dtype)
                if store_gates:
                    gs_ref[i, l] = gates_all[l].astype(gs_ref.dtype)
        return 0

    lax.fori_loop(0, t_blk, superstep, 0, unroll=True)


def _fwd_vmem_need(B, H, G, t_blk, dtype, store_gates, n_masks=None):
    it = jnp.dtype(dtype).itemsize
    if n_masks is None:
        n_masks = G - 1
    w = H * 4 * H * it + (G - 1) * 2 * H * 4 * H * it
    gx = t_blk * B * 4 * H * it
    msk = n_masks * t_blk * B * H * it
    outs = 2 * t_blk * G * B * H * it
    if store_gates:
        outs += t_blk * G * B * 4 * H * it
    states = 2 * G * B * H * 4
    return w + 2 * (gx + msk + outs) + states


def fwd_wavefront_eligible(B, H, G, t_blk, dtype, store_gates=True):
    return _fwd_vmem_need(B, H, G, t_blk, dtype, store_gates) < VMEM_BUDGET


def _fwd_pallas(gates_x0, biases, w0_t, w_cats, masks, h0, c0, *, hard,
                t_blk, T, interpret, store_gates):
    """gates_x0: [S_pad, B, 4H] (valid [0, T)); biases: [max(G-1,1), 1, 4H]
    f32; w0_t: [H, 4H]; w_cats: list of [2H, 4H]; masks: list of
    [S_pad, B, H] (layer l's input mask, shifted by l; may be empty);
    h0/c0: [G, B, H]. Returns (ys, cs[, gs]) each [S_pad, G, B, *]
    (layer l valid at positions [l, T+l))."""
    S_pad, B, H4 = gates_x0.shape
    H = H4 // 4
    G = len(w_cats) + 1
    dtype = h0.dtype
    grid = (S_pad // t_blk,)

    blk = lambda C: pl.BlockSpec((t_blk, G, B, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((t_blk, B, H4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(G - 1, 1), 1, H4), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * len(w_cats)
    in_specs += [
        pl.BlockSpec((t_blk, B, H), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] * len(masks)
    in_specs += [
        pl.BlockSpec((G, B, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, B, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [blk(H), blk(H)]
    out_shape = [
        jax.ShapeDtypeStruct((S_pad, G, B, H), dtype),
        jax.ShapeDtypeStruct((S_pad, G, B, H), dtype),
    ]
    if store_gates:
        out_specs.append(blk(H4))
        out_shape.append(jax.ShapeDtypeStruct((S_pad, G, B, H4), dtype))
    kernel = functools.partial(_fwd_kernel, hard=hard, t_blk=t_blk, G=G,
                               T=T, n_masks=len(masks),
                               store_gates=store_gates)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((G, B, H), jnp.float32),
            pltpu.VMEM((G, B, H), jnp.float32),
            pltpu.VMEM((H, H4), w0_t.dtype),
            *[pltpu.VMEM((2 * H, H4), w.dtype) for w in w_cats],
            pltpu.SemaphoreType.DMA((G,)),
        ],
        compiler_params=_compiler_params(
            _fwd_vmem_need(B, H, G, t_blk, dtype, store_gates, len(masks))
        ),
        interpret=interpret,
    )(gates_x0, biases, w0_t, *w_cats, *masks, h0, c0)


# -------------------------------------------------------------- backward
def _bwd_kernel(
    gs_ref, cs_ref, cp_ref, dys_ref, dcs_ref, *rest,
    hard, t_blk, G, T, n_masks,
):
    mask_refs = rest[:n_masks]
    wr_hbm = rest[n_masks : n_masks + G]   # layer l: [w_hh^l ; w_ih^{l+1}]
    outs = rest[n_masks + G :]
    dg_ref, dh0_ref, dc0_ref = outs[0], outs[1], outs[2]
    scr = outs[3:]
    dc_scr = scr[0]
    wr_scr = list(scr[1 : 1 + G])
    sems = scr[1 + G]
    dga_scr = scr[2 + G]                   # [G, B, 4H] f32 handoffs

    @pl.when(pl.program_id(0) == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dga_scr[:] = jnp.zeros_like(dga_scr)
        for i in range(G):
            pltpu.make_async_copy(wr_hbm[i], wr_scr[i], sems.at[i]).start()
        for i in range(G):
            pltpu.make_async_copy(wr_hbm[i], wr_scr[i], sems.at[i]).wait()

    f32 = jnp.float32
    H = dc_scr.shape[-1]

    pid = pl.program_id(0)

    def superstep(i, _):
        r = pid * t_blk + i
        # snapshot cross-layer dgates handoffs (start-of-superstep values)
        wdt = wr_scr[0].dtype
        dga_prev = [dga_scr[l].astype(wdt) for l in range(G)]
        # the independent backprop matmuls:
        #   dh^l = dgates^l_{t+1} @ w_hh^l  (+ masked from-above term)
        dh_mat = []
        for l in range(G):
            if l < G - 1:
                if mask_refs:
                    # mask applies to the [B, H] OUTPUT of the from-above
                    # product -> two matmuls (still independent MXU work)
                    own = jnp.dot(dga_prev[l], wr_scr[l][: 4 * H],
                                  preferred_element_type=f32)
                    above = jnp.dot(dga_prev[l + 1], wr_scr[l][4 * H :],
                                    preferred_element_type=f32)
                    dh_mat.append(
                        own + above * mask_refs[l][i].astype(f32)
                    )
                else:
                    stacked = jnp.concatenate(
                        [dga_prev[l], dga_prev[l + 1]], axis=-1
                    )
                    dh_mat.append(
                        jnp.dot(stacked, wr_scr[l][:],
                                preferred_element_type=f32)
                    )
            else:
                dh_mat.append(
                    jnp.dot(dga_prev[l], wr_scr[l][:],
                            preferred_element_type=f32)
                )
        for l in range(G):
            lag = G - 1 - l

            @pl.when((r >= lag) & (r < T + lag))
            def _(l=l, lag=lag):
                gates = gs_ref[i, l].astype(f32)
                gi = gates[:, 0 * H: 1 * H]
                gf = gates[:, 1 * H: 2 * H]
                gg = gates[:, 2 * H: 3 * H]
                go = gates[:, 3 * H: 4 * H]
                ct = cs_ref[i, l].astype(f32)
                if hard:
                    i_a, f_a, o_a = (hard_sigmoid(gi), hard_sigmoid(gf),
                                     hard_sigmoid(go))
                    g_a = hard_tanh(gg)
                    di_a = jnp.where((gi > -4.0) & (gi < 4.0), 0.125, 0.0)
                    df_a = jnp.where((gf > -4.0) & (gf < 4.0), 0.125, 0.0)
                    do_a = jnp.where((go > -4.0) & (go < 4.0), 0.125, 0.0)
                    dg_a = jnp.where((gg > -1.0) & (gg < 1.0), 1.0, 0.0)
                    tanh_c = hard_tanh(ct)
                    dtanh_c = jnp.where((ct > -1.0) & (ct < 1.0), 1.0, 0.0)
                else:
                    i_a, f_a, o_a = (jax.nn.sigmoid(gi), jax.nn.sigmoid(gf),
                                     jax.nn.sigmoid(go))
                    g_a = jnp.tanh(gg)
                    di_a = i_a * (1.0 - i_a)
                    df_a = f_a * (1.0 - f_a)
                    do_a = o_a * (1.0 - o_a)
                    dg_a = 1.0 - g_a * g_a
                    tanh_c = jnp.tanh(ct)
                    dtanh_c = 1.0 - tanh_c * tanh_c

                dh = dys_ref[i, l].astype(f32) + dh_mat[l]
                dc = dc_scr[l] + dcs_ref[i, l].astype(f32) + dh * o_a * dtanh_c
                da_i = dc * g_a * di_a
                da_f = dc * cp_ref[i, l].astype(f32) * df_a
                da_g = dc * i_a * dg_a
                da_o = dh * tanh_c * do_a
                dgates = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
                dg_ref[i, l] = dgates.astype(dg_ref.dtype)
                dga_scr[l] = dgates
                dc_scr[l] = dc * f_a

                # layer l's final superstep (t = 0) emits its state cotangents
                @pl.when(r == T + lag - 1)
                def _():
                    dh0_ref[l] = jnp.dot(
                        dgates.astype(wdt), wr_scr[l][: 4 * H],
                        preferred_element_type=f32,
                    ).astype(dh0_ref.dtype)
                    dc0_ref[l] = (dc * f_a).astype(dc0_ref.dtype)

            # outside its window the handoff must read as zero, so the layer
            # below sees no phantom from-above term after l finishes
            @pl.when(jnp.logical_not((r >= lag) & (r < T + lag)))
            def _(l=l):
                dga_scr[l] = jnp.zeros_like(dga_scr[l])
        return 0

    lax.fori_loop(0, t_blk, superstep, 0, unroll=True)


def _bwd_vmem_need(B, H, G, t_blk, dtype, n_masks=None):
    it = jnp.dtype(dtype).itemsize
    if n_masks is None:
        n_masks = G - 1
    w = (8 * H * H * (G - 1) + 4 * H * H) * it
    streams = t_blk * G * B * (4 * H + 3 * H + 4 * H) * it  # ins + dg out
    msk = n_masks * t_blk * B * H * it
    states = (G * B * H + G * B * 4 * H) * 4
    return w + 2 * (streams + msk) + states


def bwd_t_blk(B, H, G, dtype) -> Optional[int]:
    """Largest reverse-block size whose working set fits VMEM."""
    for t in (8, 4, 2, 1):
        if _bwd_vmem_need(B, H, G, t, dtype) < VMEM_BUDGET:
            return t
    return None


def _bwd_pallas(gs, cs, cp, dys, dcs, masks, w_rs, *, hard, t_blk, T,
                interpret):
    """All streams [S_pad, G, B, *] in REVERSED wavefront layout (layer l's
    reversed timestep t' at position t' + (G-1-l)); masks likewise (mask
    of the l -> l+1 handoff at layer l's positions). w_rs: list of G
    matrices, layer l: [w_hh^l ; w_ih^{l+1}] [8H, H] (top: [w_hh] [4H, H]).
    Returns (dgates [S_pad, G, B, 4H] same layout, dh0, dc0 [G, B, H] f32)."""
    S_pad, G, B, H4 = gs.shape
    H = H4 // 4
    blk = lambda C: pl.BlockSpec((t_blk, G, B, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [blk(H4), blk(H), blk(H), blk(H), blk(H)]
    in_specs += [
        pl.BlockSpec((t_blk, B, H), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] * len(masks)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * G
    kernel = functools.partial(_bwd_kernel, hard=hard, t_blk=t_blk, G=G,
                               T=T, n_masks=len(masks))
    dgates, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(S_pad // t_blk,),
        in_specs=in_specs,
        out_specs=[
            blk(H4),
            pl.BlockSpec((G, B, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, B, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, G, B, H4), gs.dtype),
            jax.ShapeDtypeStruct((G, B, H), jnp.float32),
            jax.ShapeDtypeStruct((G, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, B, H), jnp.float32),
            *[pltpu.VMEM(tuple(w.shape), w.dtype) for w in w_rs],
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.VMEM((G, B, H4), jnp.float32),
        ],
        compiler_params=_compiler_params(
            _bwd_vmem_need(B, H, G, t_blk, gs.dtype, len(masks))
        ),
        interpret=interpret,
    )(gs, cs, cp, dys, dcs, *masks, *w_rs)
    return dgates, dh0, dc0


# ------------------------------------------------------ shifted layouts
def _pad_supersteps(T, G, t_blk):
    return -(-(T + G - 1) // t_blk) * t_blk


def _shift_stack(arrs: Sequence[jax.Array], shifts: Sequence[int],
                 S_pad: int) -> jax.Array:
    """Stack per-layer [T, B, C] arrays into [S_pad, G, B, C], placing
    arrs[l][t] at superstep position t + shifts[l]."""
    T = arrs[0].shape[0]
    cols = []
    for x, sh in zip(arrs, shifts):
        pad = [(sh, S_pad - T - sh)] + [(0, 0)] * (x.ndim - 1)
        cols.append(jnp.pad(x, pad))
    return jnp.stack(cols, axis=1)


def _unshift(y: jax.Array, shifts: Sequence[int], T: int) -> jax.Array:
    """Inverse of _shift_stack: [S_pad, G, B, C] -> [G, T, B, C]."""
    return jnp.stack(
        [lax.dynamic_slice_in_dim(y[:, l], sh, T, axis=0)
         for l, sh in enumerate(shifts)],
        axis=0,
    )


# ------------------------------------------------------------ custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wavefront_core(static, gates_x0, biases, w0_t, w_cats, h0, c0,
                    dropmasks):
    """static = (hard, t_blk, T, interpret, store_gates) — hashables only.

    gates_x0: [T, B, 4H] (layer 0's input projection + bias); biases:
    [max(G-1,1), 1, 4H] f32 (inner-layer b_ih + b_hh); w_cats: tuple of
    [2H, 4H] stacks [w_ih ; w_hh]; h0/c0: [G, B, H]; dropmasks: tuple of
    [T, B, H] dropout scale fields entering layers 1..G-1 (or () for
    none) — treated as constants (zero cotangent).
    Returns (ys, cs) each [G, T, B, H]."""
    out = _fwd_run(static, gates_x0, biases, w0_t, w_cats, h0, c0,
                   dropmasks, store_gates=False)
    return out[0], out[1]


def _fwd_run(static, gates_x0, biases, w0_t, w_cats, h0, c0, dropmasks,
             store_gates):
    hard, t_blk, T, interpret, _sg = static
    G = len(w_cats) + 1
    S_pad = _pad_supersteps(T, G, t_blk)
    gx = jnp.pad(gates_x0, ((0, S_pad - T), (0, 0), (0, 0)))
    # mask entering layer l is consumed at superstep t + l -> shift by l
    shifted_masks = [
        jnp.pad(m, ((idx + 1, S_pad - T - (idx + 1)), (0, 0), (0, 0)))
        for idx, m in enumerate(dropmasks)
    ]
    out = _fwd_pallas(gx, biases, w0_t, list(w_cats), shifted_masks, h0, c0,
                      hard=hard, t_blk=t_blk, T=T, interpret=interpret,
                      store_gates=store_gates)
    shifts = list(range(G))
    ys = _unshift(out[0], shifts, T)
    cs = _unshift(out[1], shifts, T)
    if store_gates:
        return ys, cs, _unshift(out[2], shifts, T)
    return ys, cs


def _wavefront_fwd(static, gates_x0, biases, w0_t, w_cats, h0, c0, dropmasks):
    store_gates = static[4]
    out = _fwd_run(static, gates_x0, biases, w0_t, w_cats, h0, c0, dropmasks,
                   store_gates=store_gates)
    ys, cs = out[0], out[1]
    gs = out[2] if store_gates else None
    return (ys, cs), (gs, gates_x0, biases, w0_t, w_cats, h0, c0, dropmasks,
                      ys, cs)


def _wavefront_bwd(static, res, grads):
    hard, t_blk_fwd, T, interpret, store_gates = static
    gs, gates_x0, biases, w0_t, w_cats, h0, c0, dropmasks, ys, cs = res
    dys, dcs = grads  # [G, T, B, H] each
    G = ys.shape[0]
    B, H = ys.shape[2], ys.shape[3]
    f32 = jnp.float32
    dtype = ys.dtype

    h_prev = jnp.concatenate([h0[:, None].astype(dtype), ys[:, :-1]], axis=1)
    c_prev = jnp.concatenate([c0[:, None].astype(dtype), cs[:, :-1]], axis=1)

    # inner-layer inputs: dropped previous-layer outputs
    xs_inner = []
    for l in range(1, G):
        x = ys[l - 1]
        if dropmasks:
            x = (x.astype(f32) * dropmasks[l - 1].astype(f32)).astype(dtype)
        xs_inner.append(x)

    if gs is None:
        # recompute pre-activations with big GEMMs (bias included)
        rec = [
            (gates_x0.astype(f32) + jnp.dot(
                h_prev[0].reshape(T * B, H).astype(w0_t.dtype), w0_t,
                preferred_element_type=f32,
            ).reshape(T, B, 4 * H)).astype(dtype)
        ]
        for l in range(1, G):
            xin = jnp.concatenate([xs_inner[l - 1], h_prev[l]], axis=-1)
            rec.append((jnp.dot(
                xin.reshape(T * B, 2 * H).astype(w_cats[l - 1].dtype),
                w_cats[l - 1], preferred_element_type=f32,
            ).reshape(T, B, 4 * H) + biases[l - 1]).astype(dtype))
        gs = jnp.stack(rec, axis=0)

    # resident reverse matrices: layer l gets [w_hh^l ; w_ih^{l+1}]
    w_hh_l = [jnp.swapaxes(w0_t, 0, 1)] + [
        jnp.swapaxes(w[H:], 0, 1) for w in w_cats
    ]
    w_ih_l = [None] + [jnp.swapaxes(w[:H], 0, 1) for w in w_cats]
    w_rs = []
    for l in range(G):
        if l < G - 1:
            w_rs.append(jnp.concatenate([w_hh_l[l], w_ih_l[l + 1]], axis=0))
        else:
            w_rs.append(w_hh_l[l])

    t_blk = bwd_t_blk(B, H, G, dtype) or 1
    S_pad = _pad_supersteps(T, G, t_blk)
    rshifts = [G - 1 - l for l in range(G)]

    def rev_shift(stack):  # [G, T, B, C] -> reversed wavefront layout
        return _shift_stack(
            [jnp.flip(stack[l], axis=0) for l in range(G)], rshifts, S_pad
        )

    rmasks = []
    if dropmasks:
        for l in range(G - 1):
            m = jnp.flip(dropmasks[l].astype(dtype), axis=0)
            sh = G - 1 - l
            rmasks.append(jnp.pad(m, ((sh, S_pad - T - sh), (0, 0), (0, 0))))

    dg_r, dh0, dc0 = _bwd_pallas(
        rev_shift(gs).astype(dtype), rev_shift(cs), rev_shift(c_prev),
        rev_shift(dys), rev_shift(dcs), rmasks, w_rs,
        hard=hard, t_blk=t_blk, T=T, interpret=interpret,
    )
    dgs = jnp.flip(_unshift(dg_r, rshifts, T), axis=1)  # [G, T, B, 4H]

    # dW / dbias via big GEMMs over the emitted dgates
    d_w0 = jnp.dot(
        h_prev[0].reshape(T * B, H).astype(w0_t.dtype).T,
        dgs[0].reshape(T * B, 4 * H).astype(w0_t.dtype),
        preferred_element_type=f32,
    ).astype(w0_t.dtype)
    d_wcats, d_biases = [], []
    for l in range(1, G):
        xin = jnp.concatenate([xs_inner[l - 1], h_prev[l]], axis=-1)
        d_wcats.append(
            jnp.dot(
                xin.reshape(T * B, 2 * H).astype(dtype).T,
                dgs[l].reshape(T * B, 4 * H).astype(dtype),
                preferred_element_type=f32,
            ).astype(w_cats[l - 1].dtype)
        )
        d_biases.append(jnp.sum(dgs[l].astype(f32), axis=(0, 1))[None, :])
    d_gates_x0 = dgs[0].astype(gates_x0.dtype)
    d_bias_arr = (jnp.stack(d_biases, axis=0) if d_biases
                  else jnp.zeros_like(biases))
    d_dropmasks = tuple(jnp.zeros_like(m) for m in dropmasks)
    return (d_gates_x0, d_bias_arr, d_w0, tuple(d_wcats),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype), d_dropmasks)


_wavefront_core.defvjp(_wavefront_fwd, _wavefront_bwd)


# ---------------------------------------------------------- public entry
def run_lstm_stack_wavefront(
    layer_params: Sequence[dict],
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    *,
    hard: bool = False,
    t_blk: int = 4,
    dropout: float = 0.0,
    rngs: Optional[Sequence[jax.Array]] = None,
    interpret: Optional[bool] = None,
    store_gates: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Run G stacked same-width LSTM layers as one wavefront kernel.

    layer_params: per-layer dicts (w_ih [4H, I], w_hh [4H, H], b_ih,
    b_hh); layers 1..G-1 must have I == H. x: [T, B, I0]; h0/c0:
    [G, B, H]. ``dropout``/``rngs``: inter-layer dropout entering layers
    1..G-1, one key per boundary — pass the SAME keys run_lstm would
    burn so RNG streams agree across implementations.

    Returns (all_ys, all_cs) each [G, T, B, H] — raw, pre-dropout,
    matching run_lstm's all_h/all_c contract.
    """
    T, B, _ = x.shape
    G = len(layer_params)
    H = layer_params[0]["w_hh"].shape[1]
    dtype = x.dtype
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    p0 = layer_params[0]
    w0_ih_t = p0["w_ih"].astype(dtype).T
    bias0 = (p0["b_ih"] + p0["b_hh"]).astype(jnp.float32)
    gates_x0 = (
        jnp.dot(x.reshape(T * B, -1), w0_ih_t,
                preferred_element_type=jnp.float32).reshape(T, B, -1)
        + bias0
    ).astype(dtype)
    w0_t = p0["w_hh"].astype(dtype).T

    w_cats, biases_inner = [], []
    for p in layer_params[1:]:
        w_cats.append(jnp.concatenate(
            [p["w_ih"].astype(dtype).T, p["w_hh"].astype(dtype).T], axis=0
        ))
        biases_inner.append((p["b_ih"] + p["b_hh"]).astype(jnp.float32))
    biases = (jnp.stack(biases_inner)[:, None, :] if biases_inner
              else jnp.zeros((1, 1, 4 * H), jnp.float32))

    dropmasks = []
    if dropout > 0.0:
        if rngs is None or len(rngs) != G - 1:
            raise ValueError("dropout requires one rng per layer boundary")
        for key in rngs:
            keep = jax.random.bernoulli(key, 1.0 - dropout, (T, B, H))
            dropmasks.append(
                jnp.where(keep, 1.0 / (1.0 - dropout), 0.0).astype(dtype)
            )

    static = (hard, t_blk, T, interpret, store_gates)
    ys, cs = _wavefront_core(
        static, gates_x0, biases, w0_t, tuple(w_cats),
        h0.astype(dtype), c0.astype(dtype), tuple(dropmasks)
    )
    return ys, cs
