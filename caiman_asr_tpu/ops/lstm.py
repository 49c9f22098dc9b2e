"""Time-major multi-layer LSTM built on ``lax.scan``.

TPU-native replacement for the reference's fused CUDA LSTM
(reference: training/lib/csrc/lstm.cu, training/lib/src/rnnt_ext/custom_lstm/lstm.py).

Design notes (TPU-first, not a translation):

- The input projection ``x @ W_ih^T`` for *all* timesteps is a single large
  matmul (maps onto the MXU as one [T*B, I] x [I, 4H] GEMM), mirroring the
  reference's one-shot ``addmm`` but letting XLA pick the tiling.
- The sequential part is a ``lax.scan`` whose per-step work is one
  [B, H] x [H, 4H] MXU matmul plus fused VPU gate math. XLA keeps the carry
  in VMEM/registers; there is no per-step kernel-launch overhead on TPU.
- The cell state is carried in float32 regardless of the compute dtype
  (bf16 matmuls with fp32 accumulation via ``preferred_element_type``),
  matching the numerical behaviour the reference gets from CUDA's
  ``at::acc_type`` accumulators.
- ``hard=True`` switches to the FPGA-parity hard activations
  (hard-sigmoid ``clip(0.5 + z/8, 0, 1)``, hard-tanh ``clip(z, -1, 1)``;
  reference: lib/csrc/lstm.cu Math<Kind::hard>). These are exactly
  representable, so a model trained hard can be served on fixed-point
  hardware bit-for-bit.
- All per-step hidden/cell states are returned (the reference does the same,
  lstm.py:76-93) because streaming state extraction (random state passing)
  needs the state at the last *non-padded* step of each batch element.

Weight layout per layer (PyTorch-compatible gate order i, f, g, o):
  ``w_ih [4H, I]``, ``w_hh [4H, H]``, ``b_ih [4H]``, ``b_hh [4H]``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


def hard_sigmoid(z: jax.Array) -> jax.Array:
    """FPGA-parity hard sigmoid: clip(0.5 + z/8, 0, 1)."""
    return jnp.clip(0.5 + z * 0.125, 0.0, 1.0)


def hard_tanh(z: jax.Array) -> jax.Array:
    """FPGA-parity hard tanh: clip(z, -1, 1)."""
    return jnp.clip(z, -1.0, 1.0)


def init_lstm_layer(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    *,
    forget_gate_bias: Optional[float] = 1.0,
    weights_init_scale: float = 1.0,
    hidden_hidden_bias_scale: float = 0.0,
    batch_norm: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init with the reference's bias policy.

    Reference: lib/src/rnnt_ext/custom_lstm/lstm.py:211-215 (uniform init) and
    caiman_asr_train/rnnt/rnn.py:150-161 (weights_init_scale, forget-gate bias
    fill on b_ih, hidden_hidden_bias_scale on b_hh).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rsh = 1.0 / math.sqrt(hidden_size)
    H = hidden_size

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype=jnp.float32, minval=-rsh, maxval=rsh)

    w_ih = u(k1, (4 * H, input_size)) * weights_init_scale
    w_hh = u(k2, (4 * H, H)) * weights_init_scale
    b_ih = u(k3, (4 * H,)) * weights_init_scale
    b_hh = u(k4, (4 * H,)) * weights_init_scale
    if forget_gate_bias is not None:
        b_ih = b_ih.at[H : 2 * H].set(forget_gate_bias)
        b_hh = b_hh.at[H : 2 * H].multiply(hidden_hidden_bias_scale)
    p = {
        "w_ih": w_ih.astype(dtype),
        "w_hh": w_hh.astype(dtype),
        "b_ih": b_ih.astype(dtype),
        "b_hh": b_hh.astype(dtype),
    }
    if batch_norm:
        # per-layer BatchNorm over the hidden features (reference
        # rnn.py:102-127: BatchNorm1d after every 1-layer LSTM). scale/bias
        # are trained; mean/var are running statistics updated by the train
        # step (the optimizer must not touch them — see
        # training/optimizer.py bn-stat mask).
        p["bn"] = {
            "scale": jnp.ones((H,), jnp.float32),
            "bias": jnp.zeros((H,), jnp.float32),
            "mean": jnp.zeros((H,), jnp.float32),
            "var": jnp.ones((H,), jnp.float32),
        }
    return p


def init_lstm(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    **kw,
) -> Params:
    """Initialise a stack of LSTM layers: ``{"layer_0": {...}, ...}``."""
    keys = jax.random.split(key, num_layers)
    params = {}
    for i in range(num_layers):
        in_size = input_size if i == 0 else hidden_size
        params[f"layer_{i}"] = init_lstm_layer(keys[i], in_size, hidden_size, **kw)
    return params


def _gate_math(
    gates: jax.Array, c: jax.Array, hard: bool, quantize: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Fused LSTM gate computation. gates: [..., 4H] fp32; c: [..., H] fp32.

    quantize=True emulates the FPGA's brainfloat arithmetic at the
    reference's exact points (legacy.py:259-293: gates bf16 after the sum,
    each gate bf16 after its activation, cell and hidden bf16)."""
    if quantize:
        from caiman_asr_tpu.ops.quantize import brain_float_quantize as bf16q

        gates = bf16q(gates)
    H = c.shape[-1]
    i = gates[..., 0 * H : 1 * H]
    f = gates[..., 1 * H : 2 * H]
    g = gates[..., 2 * H : 3 * H]
    o = gates[..., 3 * H : 4 * H]
    sig = hard_sigmoid if hard else jax.nn.sigmoid
    tnh = hard_tanh if hard else jnp.tanh
    if quantize:
        i, f, g, o = bf16q(sig(i)), bf16q(sig(f)), bf16q(tnh(g)), bf16q(sig(o))
        c_new = bf16q(f * c + i * g)
        h_new = bf16q(o * tnh(c_new))
        return h_new, c_new
    c_new = sig(f) * c + sig(i) * tnh(g)
    h_new = sig(o) * tnh(c_new)
    return h_new, c_new


def _bfp_weights(w_t: jax.Array) -> jax.Array:
    """FPGA weight quantization: brainfloat then block-floating-point with
    a shared exponent per 8 consecutive elements of the contraction dim
    (reference legacy.py:251-252 + quantize.py BfpQuantizer(dim=0, 8))."""
    from caiman_asr_tpu.ops.quantize import bfp_quantize, brain_float_quantize

    return bfp_quantize(brain_float_quantize(w_t), man_bits=8, axis=0, block=8)


def _bfp_acts(x: jax.Array) -> jax.Array:
    """FPGA activation quantization along the feature axis
    (reference legacy.py:264-265 + BfpQuantizer(dim=1, 8))."""
    from caiman_asr_tpu.ops.quantize import bfp_quantize, brain_float_quantize

    return bfp_quantize(brain_float_quantize(x), man_bits=8, axis=-1, block=8)


import os

# The Pallas recurrence kernel (ops/pallas_lstm.py) keeps w_hh resident in
# VMEM across the time loop — ~1.7x faster than the scan on TPU at base-model
# shapes. Used automatically when shapes are tile-aligned and fit VMEM;
# disable with CAIMAN_PALLAS_LSTM=0.
_PALLAS_ENABLED = os.environ.get("CAIMAN_PALLAS_LSTM", "1") != "0"
_PALLAS_T_BLK = int(os.environ.get("CAIMAN_PALLAS_LSTM_TBLK", "4"))


def _pallas_ok(T: int, B: int, H: int, dtype) -> bool:
    if not _PALLAS_ENABLED or T < 2 * _PALLAS_T_BLK:
        return False
    if B % 8 != 0 or H % 128 != 0:
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
        from caiman_asr_tpu.ops.pallas_lstm import pallas_eligible

        return pallas_eligible(B, H, _PALLAS_T_BLK, dtype)
    except Exception:
        return False


def run_lstm_layer(
    params: Params,
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    *,
    hard: bool = False,
    quantize: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run one LSTM layer over a time-major sequence.

    Args:
      x: [T, B, I] input sequence.
      h0, c0: [B, H] initial states.
      quantize: emulate the FPGA's brainfloat/BFP arithmetic (reference
        `quantize: true` -> legacy.py quantization points); eval-only.

    Returns:
      (ys, cs): all hidden and cell states, each [T, B, H], in x.dtype.
    """
    T, B, _ = x.shape
    H = params["w_hh"].shape[1]
    if not quantize and _pallas_ok(T, B, H, x.dtype):
        from caiman_asr_tpu.ops.pallas_lstm import run_lstm_layer_pallas

        return run_lstm_layer_pallas(
            params, x, h0, c0, hard=hard, t_blk=_PALLAS_T_BLK, interpret=False
        )
    dtype = x.dtype
    w_ih_t = params["w_ih"].astype(dtype).T  # [I, 4H]
    w_hh_t = params["w_hh"].astype(dtype).T  # [H, 4H]
    if quantize:
        from caiman_asr_tpu.ops.quantize import brain_float_quantize

        dtype = jnp.float32  # quantization defines the precision itself
        w_ih_t = _bfp_weights(w_ih_t.astype(dtype))
        w_hh_t = _bfp_weights(w_hh_t.astype(dtype))
        x = _bfp_acts(x.astype(dtype))
        # the reference sums ((xU + hV) + bih) + bhh in that order
        # (legacy.py:272-275); keep it so bf16 rounding is bit-identical
        bi = brain_float_quantize(params["b_ih"].astype(jnp.float32))
        bh = brain_float_quantize(params["b_hh"].astype(jnp.float32))

        gates_x = jnp.dot(
            x.reshape(T * B, -1), w_ih_t, preferred_element_type=jnp.float32
        ).reshape(T, B, -1)

        def qstep(carry, gx):
            h, c = carry
            h = _bfp_acts(h)
            gates = (
                gx + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
                + bi + bh
            )
            h_new, c_new = _gate_math(gates, c, hard, True)
            return (h_new, c_new), (h_new, c_new)

        (_, _), (ys, cs) = lax.scan(
            qstep, (h0.astype(dtype), c0.astype(dtype)), gates_x
        )
        return ys, cs

    bias = (params["b_ih"] + params["b_hh"]).astype(jnp.float32)

    # One big MXU matmul for the input projection across all timesteps.
    gates_x = (
        jnp.dot(x.reshape(T * B, -1), w_ih_t, preferred_element_type=jnp.float32)
        .reshape(T, B, -1)
        + bias
    )

    def step(carry, gx):
        h, c = carry  # h: [B, H] dtype, c: [B, H] fp32
        gates = gx + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        h_new, c_new = _gate_math(gates, c, hard)
        h_out = h_new.astype(dtype)
        return (h_out, c_new), (h_out, c_new.astype(dtype))

    (_, _), (ys, cs) = lax.scan(
        step, (h0.astype(dtype), c0.astype(jnp.float32)), gates_x
    )
    return ys, cs


BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batch_norm_apply(bn, y, train: bool, updates: Optional[list] = None):
    """BatchNorm over the feature axis of y [..., H] (torch BatchNorm1d
    semantics, reference rnn.py:184-186: normalizes over every (time, batch)
    position, padded frames included).

    train=True normalizes with batch statistics and, when ``updates`` is
    given, appends the raw ``(batch_mean, unbiased_batch_var)`` pair — the
    train step folds these into the running stats with the torch momentum
    rule (biased batch var for normalization, unbiased for the running
    estimate). train=False applies the stored running stats — a pure
    per-feature affine, which XLA fuses into the surrounding matmuls."""
    yf = y.astype(jnp.float32)
    if train:
        axes = tuple(range(y.ndim - 1))
        mu = jnp.mean(yf, axes)
        var = jnp.mean(jnp.square(yf - mu), axes)
        if updates is not None:
            n = math.prod(y.shape[:-1])
            unbiased = var * (n / max(n - 1, 1))
            updates.append(
                (jax.lax.stop_gradient(mu), jax.lax.stop_gradient(unbiased))
            )
    else:
        mu, var = bn["mean"], bn["var"]
    out = (yf - mu) * jax.lax.rsqrt(var + BN_EPS) * bn["scale"] + bn["bias"]
    return out.astype(y.dtype)


def run_lstm(
    params: Params,
    x: jax.Array,
    state: Optional[Tuple[jax.Array, jax.Array]] = None,
    *,
    hard: bool = False,
    quantize: bool = False,
    dropout: float = 0.0,
    rw_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    bn_updates: Optional[list] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Run a multi-layer LSTM stack.

    Mirrors the reference CustomLSTM contract
    (lib/src/rnnt_ext/custom_lstm/lstm.py:329-399): returns
    ``(output, (h_n, c_n), (all_h, all_c))`` where ``output`` is [T, B, H],
    ``h_n``/``c_n`` are [L, B, H] final states and ``all_h``/``all_c`` are
    [L, T, B, H] every state of every layer (needed for streaming state
    extraction at per-utterance sequence ends).

    Inter-layer dropout (and output dropout, matching rnnt/rnn.py:205-206)
    is applied when ``train`` and ``dropout > 0``. ``rw_dropout`` is
    DropConnect on the recurrent weights — a fresh mask on ``w_hh`` per
    forward (reference: enc_rw_dropout/pred_rw_dropout, rnn.py + custom
    lstm wrapper).
    """
    num_layers = len(params)
    T, B, _ = x.shape
    H = params["layer_0"]["w_hh"].shape[1]

    use_dropout = train and dropout > 0.0
    use_rw = train and rw_dropout > 0.0
    if (use_dropout or use_rw) and rng is None:
        raise ValueError("dropout requires an rng key")

    all_h, all_c = [], []
    out = x
    for i in range(num_layers):
        if i > 0 and use_dropout:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0).astype(out.dtype)
        if state is None:
            h0 = jnp.zeros((B, H), dtype=x.dtype)
            c0 = jnp.zeros((B, H), dtype=x.dtype)
        else:
            h0 = lax.stop_gradient(state[0][i])
            c0 = lax.stop_gradient(state[1][i])
        layer_params = params[f"layer_{i}"]
        if use_rw:
            rng, sub = jax.random.split(rng)
            w_hh = layer_params["w_hh"]
            keep = jax.random.bernoulli(sub, 1.0 - rw_dropout, w_hh.shape)
            layer_params = dict(
                layer_params,
                w_hh=jnp.where(keep, w_hh / (1.0 - rw_dropout), 0.0).astype(
                    w_hh.dtype
                ),
            )
        ys, cs = run_lstm_layer(
            layer_params, out, h0, c0, hard=hard,
            quantize=quantize and not train,
        )
        all_h.append(ys)
        all_c.append(cs)
        out = ys
        if "bn" in layer_params:
            # recurrent state stays raw (reference rnn.py:179-192: BN is on
            # the layer output path only, h_f/c_f are the LSTM's own states)
            out = batch_norm_apply(layer_params["bn"], out, train, bn_updates)

    if use_dropout:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout), 0.0).astype(out.dtype)

    h_n = jnp.stack([h[-1] for h in all_h], axis=0)
    c_n = jnp.stack([c[-1] for c in all_c], axis=0)
    return out, (h_n, c_n), (jnp.stack(all_h, 0), jnp.stack(all_c, 0))


@partial(jax.jit, static_argnames=("hard", "quantize"))
def lstm_step(
    params: Params,
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
    *,
    hard: bool = False,
    quantize: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-frame streaming step through the full stack.

    Args:
      x: [B, I] one frame.
      h, c: [L, B, H] current states.

    Returns:
      (y, h_new, c_new) with y [B, H]. This is the per-frame inference
      primitive for low-latency streaming (no sequence dimension at all).
    """
    num_layers = h.shape[0]
    hs, cs = [], []
    out = x
    for i in range(num_layers):
        p = params[f"layer_{i}"]
        dtype = out.dtype
        w_ih_t = p["w_ih"].astype(dtype).T
        w_hh_t = p["w_hh"].astype(dtype).T
        hi = h[i]
        if quantize:
            from caiman_asr_tpu.ops.quantize import brain_float_quantize

            w_ih_t = _bfp_weights(w_ih_t.astype(jnp.float32))
            w_hh_t = _bfp_weights(w_hh_t.astype(jnp.float32))
            out = _bfp_acts(out.astype(jnp.float32))
            hi = _bfp_acts(hi.astype(jnp.float32))
            # reference addition order (legacy.py:272-275): bih and bhh
            # added separately after the two matmul terms
            gates = (
                jnp.dot(out, w_ih_t, preferred_element_type=jnp.float32)
                + jnp.dot(hi, w_hh_t, preferred_element_type=jnp.float32)
                + brain_float_quantize(p["b_ih"].astype(jnp.float32))
                + brain_float_quantize(p["b_hh"].astype(jnp.float32))
            )
        else:
            gates = (
                jnp.dot(out, w_ih_t, preferred_element_type=jnp.float32)
                + jnp.dot(hi, w_hh_t, preferred_element_type=jnp.float32)
                + (p["b_ih"] + p["b_hh"]).astype(jnp.float32)
            )
        h_new, c_new = _gate_math(gates, c[i].astype(jnp.float32), hard, quantize)
        out = h_new.astype(dtype)
        hs.append(out)
        cs.append(c_new.astype(dtype))
        if "bn" in p:
            # inference-mode BN (running stats): pure per-feature affine;
            # the recurrent state keeps the raw h (see run_lstm)
            out = batch_norm_apply(p["bn"], out, train=False)
    return out, jnp.stack(hs, 0), jnp.stack(cs, 0)
