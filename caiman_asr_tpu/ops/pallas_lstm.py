"""Pallas TPU kernel for the LSTM recurrence.

Replaces the ``lax.scan`` hot loop of ops/lstm.run_lstm_layer (itself the
replacement for the reference CUDA kernel lib/csrc/lstm.cu:259-345) with a
single Mosaic kernel in which the **recurrent weight matrix stays resident
in VMEM across the entire time loop**. Under a scan, XLA re-reads
``w_hh`` [H, 4H] from HBM every timestep — for the base encoder
(H=1024, bf16, 8 MB) over a 500-frame utterance that is ~4 GB of redundant
HBM traffic per layer per batch; here it is fetched once.

Structure:
- the input projection (one [T*B, I] x [I, 4H] GEMM) happens outside in
  plain XLA — it is already MXU-optimal;
- the kernel runs a sequential grid over T-blocks; ``h``/``c`` persist in
  fp32 VMEM scratch across grid steps; each step does an unrolled
  [B, H] x [H, 4H] MXU matmul + fused VPU gate math per timestep and streams
  the gates block in / state blocks out (Pallas double-buffers grid blocks
  automatically);
- backward is a ``jax.custom_vjp``: pre-activations for all T are
  recomputed with ONE big GEMM from the saved states, and only the
  dh/dc recurrence runs as a reverse scan (same math the CUDA backward
  fuses, lstm.cu:325-345).

Falls back to the scan implementation when the weights don't fit VMEM or
when not running on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caiman_asr_tpu.ops.lstm import _gate_math, hard_sigmoid, hard_tanh

# v5e VMEM is ~128 MB/core; the oft-quoted 16 MB is only the compiler's
# default scoped-vmem limit, raised per-kernel via CompilerParams below
# (empirically: a 110 MB VMEM scratch compiles and runs on this chip).
# Budget 100 MB so the large-encoder w_hh (H=1536: 18.9 MB bf16) stays
# VMEM-resident across the whole time loop with room for block streaming.
VMEM_BUDGET = 100 * 1024 * 1024


def _compiler_params(need_bytes: int):
    """Raise Mosaic's scoped-vmem limit just past this kernel's working set
    (the 16 MB default is not the hardware: v5e has ~128 MB VMEM)."""
    limit = min(int(need_bytes * 1.25) + 2 * 1024 * 1024, 124 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=max(limit, 16 * 1024 * 1024))


def _kernel(
    gx_ref, w_hbm_ref, h0_ref, c0_ref, ys_ref, cs_ref,
    h_scr, c_scr, w_scr, w_sem, *, hard, t_blk,
):
    # The weight matrix is copied HBM -> VMEM exactly ONCE (grid step 0) and
    # stays resident in scratch for the whole sequence — the point of the
    # kernel. (A VMEM BlockSpec would be double-buffered: 2x8 MB = OOM.)
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        dma = pltpu.make_async_copy(w_hbm_ref, w_scr, w_sem)
        dma.start()
        dma.wait()

    def body(t, _):
        h = h_scr[:].astype(w_scr.dtype)
        gates = gx_ref[t].astype(jnp.float32) + jnp.dot(
            h, w_scr[:], preferred_element_type=jnp.float32
        )
        h_new, c_new = _gate_math(gates, c_scr[:], hard)
        h_scr[:] = h_new
        c_scr[:] = c_new
        ys_ref[t] = h_new.astype(ys_ref.dtype)
        cs_ref[t] = c_new.astype(cs_ref.dtype)
        return 0

    lax.fori_loop(0, t_blk, body, 0)


def _kernel_sg(
    gx_ref, w_hbm_ref, h0_ref, c0_ref, ys_ref, cs_ref, gs_ref,
    h_scr, c_scr, w_scr, w_sem, *, hard, t_blk,
):
    """Store-gates variant: additionally streams the FULL pre-activations
    (gx + h @ w_hh) out, so the backward pass can skip its gates-recompute
    GEMM entirely. Stored in the compute dtype — the same precision the
    recompute path streams them at (``_bwd`` casts its recomputed gates to
    ``gates_x.dtype`` before the reverse kernel), so numerics match."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        dma = pltpu.make_async_copy(w_hbm_ref, w_scr, w_sem)
        dma.start()
        dma.wait()

    def body(t, _):
        h = h_scr[:].astype(w_scr.dtype)
        gates = gx_ref[t].astype(jnp.float32) + jnp.dot(
            h, w_scr[:], preferred_element_type=jnp.float32
        )
        gs_ref[t] = gates.astype(gs_ref.dtype)
        h_new, c_new = _gate_math(gates, c_scr[:], hard)
        h_scr[:] = h_new
        c_scr[:] = c_new
        ys_ref[t] = h_new.astype(ys_ref.dtype)
        cs_ref[t] = c_new.astype(cs_ref.dtype)
        return 0

    lax.fori_loop(0, t_blk, body, 0)


def _pallas_recurrence(gates_x, w_hh_t, h0, c0, *, hard: bool, t_blk: int,
                       interpret: bool, store_gates: bool = False):
    """gates_x: [T, B, 4H] (T multiple of t_blk); returns (ys, cs[, gs])
    each [T, B, H] (gs [T, B, 4H], only when store_gates)."""
    T, B, H4 = gates_x.shape
    H = H4 // 4
    dtype = h0.dtype
    grid = (T // t_blk,)
    itemsize = jnp.dtype(dtype).itemsize
    need = (
        H * H4 * w_hh_t.dtype.itemsize  # resident weights
        + 2 * (t_blk * B * H4 + 2 * t_blk * B * H) * itemsize  # dbl-buffered
        + 2 * B * H * 4  # fp32 state scratch
        + (2 * t_blk * B * H4 * itemsize if store_gates else 0)
    )
    blk_out = pl.BlockSpec((t_blk, B, H), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [blk_out, blk_out]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), dtype),
        jax.ShapeDtypeStruct((T, B, H), dtype),
    ]
    if store_gates:
        out_specs.append(pl.BlockSpec((t_blk, B, H4), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, H4), dtype))
        kernel = functools.partial(_kernel_sg, hard=hard, t_blk=t_blk)
    else:
        kernel = functools.partial(_kernel, hard=hard, t_blk=t_blk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_blk, B, H4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # weights DMA'd manually
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H4), w_hh_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(need),
        interpret=interpret,
    )(gates_x, w_hh_t, h0, c0)
    return out


def pallas_eligible(B: int, H: int, t_blk: int, dtype) -> bool:
    """Check the VMEM working set fits."""
    itemsize = jnp.dtype(dtype).itemsize
    w = H * 4 * H * itemsize
    gx = t_blk * B * 4 * H * itemsize  # gates streamed in the compute dtype
    blocks = 2 * t_blk * B * H * itemsize
    scratch = 2 * B * H * 4
    # pallas double-buffers the streamed blocks
    return w + 2 * (gx + blocks) + scratch < VMEM_BUDGET


def _bwd_kernel(
    g_ref, cp_ref, cs_ref, dy_ref, dcs_ref, w_hbm_ref,
    dg_ref, dh0_ref, dc0_ref,
    dh_scr, dc_scr, w_scr, w_sem, *, hard, t_blk, n_blk,
):
    """Reverse recurrence with the [4H, H] matrix resident in VMEM.

    Streams (in reverse time order): gates (recomputed pre-activations),
    c_prev, c, dy, dc cotangents; emits dgates per step plus (dh0, dc0).
    The dgates -> dh_prev matmul runs against w_scr, so the 8 MB matrix is
    fetched from HBM once instead of once per timestep (the lax.scan
    backward re-reads it every step: ~16 GB/step for the base encoder)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dma = pltpu.make_async_copy(w_hbm_ref, w_scr, w_sem)
        dma.start()
        dma.wait()

    f32 = jnp.float32
    H = dh_scr.shape[1]

    def body(k, _):
        t = t_blk - 1 - k
        gates = g_ref[t].astype(f32)          # [B, 4H]
        gi = gates[:, 0 * H : 1 * H]
        gf = gates[:, 1 * H : 2 * H]
        gg = gates[:, 2 * H : 3 * H]
        go = gates[:, 3 * H : 4 * H]
        ct = cs_ref[t].astype(f32)
        if hard:
            i_a, f_a, o_a = hard_sigmoid(gi), hard_sigmoid(gf), hard_sigmoid(go)
            g_a = hard_tanh(gg)
            di_a = jnp.where((gi > -4.0) & (gi < 4.0), 0.125, 0.0)
            df_a = jnp.where((gf > -4.0) & (gf < 4.0), 0.125, 0.0)
            do_a = jnp.where((go > -4.0) & (go < 4.0), 0.125, 0.0)
            dg_a = jnp.where((gg > -1.0) & (gg < 1.0), 1.0, 0.0)
            tanh_c = hard_tanh(ct)
            dtanh_c = jnp.where((ct > -1.0) & (ct < 1.0), 1.0, 0.0)
        else:
            i_a, f_a, o_a = (
                jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
            )
            g_a = jnp.tanh(gg)
            di_a = i_a * (1.0 - i_a)
            df_a = f_a * (1.0 - f_a)
            do_a = o_a * (1.0 - o_a)
            dg_a = 1.0 - g_a * g_a
            tanh_c = jnp.tanh(ct)
            dtanh_c = 1.0 - tanh_c * tanh_c

        dh = dy_ref[t].astype(f32) + dh_scr[:]
        dc = dc_scr[:] + dcs_ref[t].astype(f32) + dh * o_a * dtanh_c
        da_i = dc * g_a * di_a
        da_f = dc * cp_ref[t].astype(f32) * df_a
        da_g = dc * i_a * dg_a
        da_o = dh * tanh_c * do_a
        dgates = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        dg_ref[t] = dgates.astype(dg_ref.dtype)
        dh_scr[:] = jnp.dot(
            dgates.astype(w_scr.dtype), w_scr[:], preferred_element_type=f32
        )
        dc_scr[:] = dc * f_a
        return 0

    lax.fori_loop(0, t_blk, body, 0)

    @pl.when(i == n_blk - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)


def _bwd_t_blk(B: int, H: int, dtype) -> Optional[int]:
    """Largest reverse-block size whose working set fits VMEM (None = use
    the scan fallback)."""
    itemsize = jnp.dtype(dtype).itemsize
    w = 4 * H * H * itemsize
    for t_blk in (32, 16, 8, 4, 2, 1):
        gates = t_blk * B * 4 * H * itemsize
        aux = 4 * t_blk * B * H * itemsize
        dg = t_blk * B * 4 * H * itemsize
        scratch = 2 * B * H * 4
        if w + 2 * (gates + aux + dg) + scratch < VMEM_BUDGET + 2 * 1024 * 1024:
            return t_blk
    return None


def _pallas_bwd_recurrence(gates, c_prev, cs, dys, dcs, w_hh, *, hard, t_blk, interpret):
    """gates/c_prev/cs/dys/dcs: [T, B, *]; w_hh: [4H, H] (= w_hh_t.T).

    Returns (dgates [T, B, 4H], dh0 [B, H] f32, dc0 [B, H] f32)."""
    T, B, H4 = gates.shape
    H = H4 // 4
    Tp = -(-T // t_blk) * t_blk
    if Tp != T:
        padt = lambda a: jnp.pad(a, ((0, Tp - T), (0, 0), (0, 0)))
        gates, c_prev, cs, dys, dcs = map(padt, (gates, c_prev, cs, dys, dcs))
    n_blk = Tp // t_blk
    rev = lambda i: (n_blk - 1 - i, 0, 0)
    itemsize = jnp.dtype(gates.dtype).itemsize
    need = (
        H4 * H * w_hh.dtype.itemsize
        + 2 * (2 * t_blk * B * H4 + 4 * t_blk * B * H) * itemsize
        + 2 * B * H * 4
    )
    kernel = functools.partial(_bwd_kernel, hard=hard, t_blk=t_blk, n_blk=n_blk)
    dgates, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((t_blk, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # w_hh DMA'd manually
        ],
        out_specs=[
            pl.BlockSpec((t_blk, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), gates.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H4, H), w_hh.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_compiler_params(need),
        interpret=interpret,
    )(gates, c_prev, cs, dys, dcs, w_hh)
    return dgates[:T], dh0, dc0


# ------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def lstm_recurrence(gates_x, w_hh_t, h0, c0, hard, t_blk, interpret,
                    store_gates=False):
    """Sequential LSTM recurrence (Pallas forward, scan backward).

    gates_x: [T, B, 4H] fp32 pre-activations (x-projection + bias);
    w_hh_t: [H, 4H]; h0, c0: [B, H]. Returns (ys, cs) each [T, B, H].

    store_gates=True makes the forward kernel also stream out the full
    pre-activations so the backward skips its gates-recompute GEMM (one
    [T*B, H] x [H, 4H] per layer). The residual set swaps gates_x for the
    stored gates — same bytes — and the stored precision equals what the
    recompute path streams, so this trades ~T*B*4H write bandwidth in
    forward for a whole GEMM in backward.
    """
    # undifferentiated call: ys/cs are identical either way, so never pay
    # the gate-streaming writes here — only the VJP forward (_fwd) stores
    out = _fwd_impl(gates_x, w_hh_t, h0, c0, hard, t_blk, interpret, False)
    return out[0], out[1]


def _fwd_impl(gates_x, w_hh_t, h0, c0, hard, t_blk, interpret, store_gates):
    T = gates_x.shape[0]
    Tp = -(-T // t_blk) * t_blk
    gx = jnp.pad(gates_x, ((0, Tp - T), (0, 0), (0, 0))) if Tp != T else gates_x
    out = _pallas_recurrence(
        gx, w_hh_t, h0, c0, hard=hard, t_blk=t_blk, interpret=interpret,
        store_gates=store_gates,
    )
    return tuple(o[:T] for o in out)


def _fwd(gates_x, w_hh_t, h0, c0, hard, t_blk, interpret, store_gates):
    out = _fwd_impl(gates_x, w_hh_t, h0, c0, hard, t_blk, interpret,
                    store_gates)
    ys, cs = out[0], out[1]
    gs = out[2] if store_gates else None
    return (ys, cs), (gs if store_gates else gates_x, w_hh_t, h0, c0, ys, cs)


def _bwd(hard, t_blk, interpret, store_gates, res, grads):
    gates_x, w_hh_t, h0, c0, ys, cs = res  # gates_x = stored gates when sg
    dys, dcs = grads
    T, B, H = ys.shape
    f32 = jnp.float32

    # previous-step states per t (h_{t-1}, c_{t-1})
    h_prev = jnp.concatenate([h0[None].astype(ys.dtype), ys[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None].astype(cs.dtype), cs[:-1]], axis=0)

    bwd_blk = _bwd_t_blk(B, H, w_hh_t.dtype)
    if bwd_blk is not None:
        # Pallas reverse kernel: W resident in VMEM, gates streamed in the
        # compute dtype — stored by the forward kernel (store_gates) or
        # recomputed here by one big GEMM.
        if store_gates:
            gates_c = gates_x
        else:
            gates_c = (
                gates_x
                + jnp.dot(
                    h_prev.reshape(T * B, H).astype(w_hh_t.dtype),
                    w_hh_t,
                    preferred_element_type=f32,
                ).reshape(T, B, 4 * H).astype(gates_x.dtype)
            )
        dgates, dh0, dc0 = _pallas_bwd_recurrence(
            gates_c, c_prev, cs, dys, dcs,
            jnp.swapaxes(w_hh_t, 0, 1),
            hard=hard, t_blk=bwd_blk, interpret=interpret,
        )
        dw = jnp.dot(
            h_prev.reshape(T * B, H).astype(w_hh_t.dtype).T,
            dgates.reshape(T * B, 4 * H).astype(w_hh_t.dtype),
            preferred_element_type=f32,
        ).astype(w_hh_t.dtype)
        return (
            dgates.astype(gates_x.dtype),
            dw,
            dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
        )

    # ONE big GEMM recomputes every pre-activation (no sequential matmuls);
    # under store_gates the forward kernel already streamed them out
    if store_gates:
        gates = gates_x.astype(f32)
    else:
        gates = gates_x.astype(f32) + jnp.dot(
            h_prev.reshape(T * B, H), w_hh_t, preferred_element_type=f32
        ).reshape(T, B, 4 * H)
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    if hard:
        i_a, f_a, o_a = hard_sigmoid(gi), hard_sigmoid(gf), hard_sigmoid(go)
        g_a = hard_tanh(gg)
        di_a = jnp.where((gi > -4.0) & (gi < 4.0), 0.125, 0.0)
        df_a = jnp.where((gf > -4.0) & (gf < 4.0), 0.125, 0.0)
        do_a = jnp.where((go > -4.0) & (go < 4.0), 0.125, 0.0)
        dg_a = jnp.where((gg > -1.0) & (gg < 1.0), 1.0, 0.0)
        ct = cs.astype(f32)
        tanh_c = hard_tanh(ct)
        dtanh_c = jnp.where((ct > -1.0) & (ct < 1.0), 1.0, 0.0)
    else:
        i_a, f_a, o_a = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
        g_a = jnp.tanh(gg)
        di_a = i_a * (1.0 - i_a)
        df_a = f_a * (1.0 - f_a)
        do_a = o_a * (1.0 - o_a)
        dg_a = 1.0 - g_a * g_a
        tanh_c = jnp.tanh(cs.astype(f32))
        dtanh_c = 1.0 - tanh_c * tanh_c

    w = w_hh_t.astype(f32)

    def step(carry, inp):
        dh_next, dc_next = carry
        dy, dcs_t, i_t, f_t, g_t, o_t, dia, dfa, dga, doa, tc, dtc, cp = inp
        dh = dy.astype(f32) + dh_next
        dc = dc_next + dcs_t.astype(f32) + dh * o_t * dtc
        da_o = dh * tc * doa
        da_i = dc * g_t * dia
        da_g = dc * i_t * dga
        da_f = dc * cp.astype(f32) * dfa
        dgates = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        dh_prev = jnp.dot(dgates, w.T, preferred_element_type=f32)
        dc_prev = dc * f_t
        return (dh_prev, dc_prev), dgates

    (dh0, dc0), dgates = lax.scan(
        step,
        (jnp.zeros((B, H), f32), jnp.zeros((B, H), f32)),
        (dys, dcs, i_a, f_a, g_a, o_a, di_a, df_a, dg_a, do_a, tanh_c, dtanh_c, c_prev),
        reverse=True,
    )
    dw = jnp.dot(
        h_prev.reshape(T * B, H).astype(f32).T,
        dgates.reshape(T * B, 4 * H),
        preferred_element_type=f32,
    ).astype(w_hh_t.dtype)
    return (
        dgates.astype(gates_x.dtype),
        dw,
        dh0.astype(h0.dtype),
        dc0.astype(c0.dtype),
    )


lstm_recurrence.defvjp(_fwd, _bwd)


def _store_gates_default() -> bool:
    """Policy for the store-gates forward (see lstm_recurrence): storing
    swaps one backward GEMM per layer for forward write bandwidth at
    identical residual memory. ON by default — the on-chip A/B (v5e,
    2026-08-20) has it winning at every measured point: large-196M step
    334.4 -> 322.5 ms at B=32 and 915.6 -> 899.0 ms at B=96, base-85M
    143.6 -> 140.9 ms. Inference never pays (the undifferentiated
    recurrence skips storing). CAIMAN_LSTM_STORE_GATES=0 opts out."""
    import os

    return os.environ.get("CAIMAN_LSTM_STORE_GATES", "1") == "1"


def run_lstm_layer_pallas(
    params,
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    *,
    hard: bool = False,
    t_blk: int = 8,
    interpret: Optional[bool] = None,
    store_gates: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.lstm.run_lstm_layer using the Pallas
    recurrence kernel. Same contract: returns (ys, cs) each [T, B, H]."""
    T, B, _ = x.shape
    dtype = x.dtype
    w_ih_t = params["w_ih"].astype(dtype).T
    w_hh_t = params["w_hh"].astype(dtype).T
    bias = (params["b_ih"] + params["b_hh"]).astype(jnp.float32)
    gates_x = (
        jnp.dot(x.reshape(T * B, -1), w_ih_t, preferred_element_type=jnp.float32)
        .reshape(T, B, -1)
        + bias
    ).astype(dtype)  # stream gates in the compute dtype (fp32 accum in-kernel)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if store_gates is None:
        store_gates = _store_gates_default()
    ys, cs = lstm_recurrence(
        gates_x, w_hh_t, h0.astype(dtype), c0.astype(dtype), hard, t_blk,
        interpret, store_gates
    )
    return ys, cs
