"""Functional RNN-T model (encoder / prediction / joint), TPU-native.

Capability-equivalent to the reference RNNT module
(training/caiman_asr_train/rnnt/model.py:52-491) but built as pure functions
over a parameter pytree: ``init(key) -> params`` and stateless ``encode`` /
``predict`` / ``joint`` methods that thread explicit RNG keys and streaming
state. That makes every entry point directly jit/pjit/vmap-able, and the
streaming state (EncoderState / PredNetState) an ordinary pytree carried
between calls.

Architecture (matching reference shapes so configs carry over):
  encoder:    pre_rnn (LSTM stack) -> StackTime(factor) -> post_rnn (LSTM
              stack) -> joint_enc Linear(H_enc -> H_joint)        [f: B,T,Hj]
  prediction: Embedding(n_classes-1) -> SOS prepend -> dec_rnn ->
              joint_pred Linear(H_pred -> H_joint)                [g: B,U+1,Hj]
  joint:      relu(f + g) -> dropout -> joint_fc Linear(H_joint -> n_classes)

The blank token is the last vocab index (no embedding row), matching the
reference (model.py:189, setup/train.py:177).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from caiman_asr_tpu.models.state import EncoderState, PredNetState, RNNTState
from caiman_asr_tpu.ops.features import stack_time
from caiman_asr_tpu.ops.lstm import init_lstm, run_lstm

Params = Dict[str, Any]


@dataclass(frozen=True)
class RNNTModelConfig:
    """Model hyperparameters (reference: configs/*.yaml `rnnt:` block)."""

    in_feats: int = 240
    enc_n_hid: int = 1024
    enc_pre_rnn_layers: int = 2
    enc_post_rnn_layers: int = 6
    enc_stack_time_factor: int = 2
    enc_dropout: float = 0.1
    enc_batch_norm: bool = False
    enc_freeze: bool = False
    pred_n_hid: int = 512
    pred_rnn_layers: int = 2
    pred_dropout: float = 0.3
    pred_batch_norm: bool = False
    joint_n_hid: int = 768
    joint_dropout: float = 0.3
    forget_gate_bias: Optional[float] = 1.0
    custom_lstm: bool = True
    quantize: bool = False
    enc_rw_dropout: float = 0.0
    pred_rw_dropout: float = 0.0
    hidden_hidden_bias_scale: float = 0.0
    weights_init_scale: float = 1.0
    enc_lr_factor: float = 1.0
    pred_lr_factor: float = 1.0
    joint_enc_lr_factor: float = 1.0
    joint_pred_lr_factor: float = 1.0
    joint_net_lr_factor: float = 1.0
    hard_activations: bool = False


def _init_linear(key, in_size, out_size):
    """torch.nn.Linear-style init: U(-1/sqrt(in), 1/sqrt(in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_size)
    return {
        "w": jax.random.uniform(k1, (out_size, in_size), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (out_size,), minval=-bound, maxval=bound),
    }


def _linear(p, x):
    return (
        jnp.dot(x, p["w"].astype(x.dtype).T, preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32)
    ).astype(x.dtype)


def _dropout(rng, x, rate):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class RNNT:
    """RNN-T model: configuration + pure init/apply functions."""

    # Per-module LR factors for the optimizer (reference: model.py:121-127).
    LR_FACTOR_MODULES = ("encoder", "prediction", "joint_enc", "joint_pred", "joint_fc")

    def __init__(self, config: RNNTModelConfig, n_classes: int):
        self.cfg = config
        self.n_classes = n_classes

    # ------------------------------------------------------------- init
    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 6)
        lstm_kw = dict(
            forget_gate_bias=cfg.forget_gate_bias,
            weights_init_scale=cfg.weights_init_scale,
            hidden_hidden_bias_scale=cfg.hidden_hidden_bias_scale,
        )
        params = {
            "encoder": {
                "pre_rnn": init_lstm(
                    keys[0], cfg.in_feats, cfg.enc_n_hid, cfg.enc_pre_rnn_layers,
                    batch_norm=cfg.enc_batch_norm, **lstm_kw,
                ),
                "post_rnn": init_lstm(
                    keys[1],
                    cfg.enc_stack_time_factor * cfg.enc_n_hid,
                    cfg.enc_n_hid,
                    cfg.enc_post_rnn_layers,
                    batch_norm=cfg.enc_batch_norm,
                    **lstm_kw,
                ),
            },
            "prediction": {
                "embed": jax.random.normal(
                    keys[2], (self.n_classes - 1, cfg.pred_n_hid)
                ),
                "dec_rnn": init_lstm(
                    keys[3], cfg.pred_n_hid, cfg.pred_n_hid, cfg.pred_rnn_layers,
                    batch_norm=cfg.pred_batch_norm, **lstm_kw,
                ),
            },
            "joint_enc": _init_linear(keys[4], cfg.enc_n_hid, cfg.joint_n_hid),
            "joint_pred": _init_linear(keys[5], cfg.pred_n_hid, cfg.joint_n_hid),
            "joint_fc": _init_linear(
                jax.random.fold_in(keys[5], 1), cfg.joint_n_hid, self.n_classes
            ),
        }
        return params

    # ----------------------------------------------------------- encode
    def encode(
        self,
        params: Params,
        x: jax.Array,
        x_lens: jax.Array,
        enc_state: Optional[EncoderState] = None,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        bn_updates: Optional[list] = None,
    ) -> Tuple[jax.Array, jax.Array, Optional[EncoderState]]:
        """Encoder. x: [T, B, in_feats] time-major. Returns (f, f_lens, state).

        f: [B, T', H_joint] (already projected by joint_enc, matching the
        reference's encode, model.py:314-342). The returned EncoderState holds
        the hidden/cell state of every layer at the last *non-padded* frame of
        each batch element (for streaming / random state passing).
        """
        cfg = self.cfg
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        enc_p = params["encoder"]

        out, _, (all_h0, all_c0) = run_lstm(
            enc_p["pre_rnn"],
            x,
            enc_state.pre_rnn if enc_state is not None else None,
            hard=cfg.hard_activations,
            quantize=cfg.quantize and not train,
            dropout=cfg.enc_dropout,
            rw_dropout=cfg.enc_rw_dropout,
            rng=rngs[0],
            train=train,
            bn_updates=bn_updates,
        )
        pre_state = _last_nonpadded_state(all_h0, all_c0, x_lens)
        out, out_lens = stack_time(out, x_lens, cfg.enc_stack_time_factor)
        out, _, (all_h1, all_c1) = run_lstm(
            enc_p["post_rnn"],
            out,
            enc_state.post_rnn if enc_state is not None else None,
            hard=cfg.hard_activations,
            quantize=cfg.quantize and not train,
            dropout=cfg.enc_dropout,
            rw_dropout=cfg.enc_rw_dropout,
            rng=rngs[1],
            train=train,
            bn_updates=bn_updates,
        )
        post_state = _last_nonpadded_state(all_h1, all_c1, out_lens)
        f = _linear(params["joint_enc"], jnp.swapaxes(out, 0, 1))  # [B, T', Hj]
        new_state = EncoderState(pre_rnn=pre_state, post_rnn=post_state)
        if cfg.enc_freeze:
            f = lax.stop_gradient(f)
        return f, out_lens, new_state

    # ---------------------------------------------------------- predict
    def predict(
        self,
        params: Params,
        y: Optional[jax.Array],
        pred_state: Optional[Tuple[jax.Array, jax.Array]] = None,
        *,
        add_sos: bool = True,
        special_sos: Optional[jax.Array] = None,
        sos_gate: Optional[jax.Array] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        batch_size: int = 1,
        bn_updates: Optional[list] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
        """Prediction network (reference: model.py:345-407).

        y: [B, U] int labels (or None for a lone SOS step). Returns
        (g [B, U+1, Hj], final (h, c) [L, B, Hp], all (h, c) [L, U+1, B, Hp]).

        sos_gate: optional [B] 0/1 array — when given with ``special_sos``,
        selects per-sample between the embedded special SOS (gate=1, RSP
        continuation) and the zero-vector SOS (gate=0). Lets random state
        passing be a traced decision instead of a recompile.
        """
        cfg = self.cfg
        embed = params["prediction"]["embed"]
        if y is not None:
            emb = embed[y]  # [B, U, Hp]
        else:
            # Lone zero-vector input (the greedy decoder's SOS step,
            # reference: decoder.py:134-139 with model.py:374-384).
            B = batch_size if pred_state is None else pred_state[0].shape[1]
            emb = jnp.zeros((B, 1, cfg.pred_n_hid), embed.dtype)

        if add_sos:
            B = emb.shape[0]
            if special_sos is None:
                start = jnp.zeros((B, 1, cfg.pred_n_hid), emb.dtype)
            else:
                start = embed[
                    jnp.clip(special_sos.reshape(B, 1), 0, embed.shape[0] - 1)
                ]
                if sos_gate is not None:
                    start = start * sos_gate.reshape(B, 1, 1).astype(start.dtype)
            emb = jnp.concatenate([start, emb], axis=1)

        seq = jnp.swapaxes(emb, 0, 1)  # [U+1, B, Hp]
        out, hid, all_hid = run_lstm(
            params["prediction"]["dec_rnn"],
            seq,
            pred_state,
            hard=cfg.hard_activations,
            quantize=cfg.quantize and not train,
            dropout=cfg.pred_dropout,
            rw_dropout=cfg.pred_rw_dropout,
            rng=rng,
            train=train,
            bn_updates=bn_updates,
        )
        g = _linear(params["joint_pred"], jnp.swapaxes(out, 0, 1))  # [B, U+1, Hj]
        return g, hid, all_hid

    def pred_step(
        self,
        params: Params,
        token: Optional[jax.Array],
        state: Tuple[jax.Array, jax.Array],
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Single-token prediction-net step for decoding.

        token: [B] int32 (values < n_classes-1) or None for the zero-vector
        SOS step. state: (h, c) [L, B, Hp]. Returns (g [B, Hj], new_state).
        """
        from caiman_asr_tpu.ops.lstm import lstm_step

        embed = params["prediction"]["embed"]
        h, c = state
        B = h.shape[1]
        if token is None:
            emb = jnp.zeros((B, self.cfg.pred_n_hid), embed.dtype)
        else:
            emb = embed[jnp.clip(token, 0, embed.shape[0] - 1)]
        y, h_new, c_new = lstm_step(
            params["prediction"]["dec_rnn"], emb, h, c,
            hard=self.cfg.hard_activations, quantize=self.cfg.quantize
        )
        g = _linear(params["joint_pred"], y)
        return g, (h_new, c_new)

    # ------------------------------------------------------------ joint
    def joint(
        self,
        params: Params,
        f: jax.Array,
        g: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Dense joint: logits [B, T, U+1, K] (reference: model.py:409-447).

        For training prefer the fused loss path (loss_from_fg below), which
        never materialises this tensor.
        """
        h = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
        if train and self.cfg.joint_dropout > 0.0:
            h = _dropout(rng, h, self.cfg.joint_dropout)
        return _linear(params["joint_fc"], h)

    def joint_step(self, params: Params, f: jax.Array, g: jax.Array) -> jax.Array:
        """Single-frame joint for decoding: f, g [B, Hj] -> logits [B, K]."""
        return _linear(params["joint_fc"], jax.nn.relu(f + g))

    # ---------------------------------------------------------- forward
    def enc_pred(
        self,
        params: Params,
        x: jax.Array,
        x_lens: jax.Array,
        y: jax.Array,
        y_lens: jax.Array,
        rnnt_state: Optional[RNNTState] = None,
        *,
        state_gate: Optional[jax.Array] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        bn_updates: Optional[list] = None,
    ):
        """Run encoder + prediction nets (reference: model.py:240-295).

        Returns ((f, f_lens), (g, g_lens), new_rnnt_state).

        state_gate: optional [B] 0/1 array gating the incoming rnnt_state
        per-sample (random state passing, train_utils/rsp.py): gate=0 is
        equivalent to rnnt_state=None for that sample without recompiling.
        """
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        enc_state = rnnt_state.enc_state if rnnt_state is not None else None
        pn_state = rnnt_state.pred_net_state if rnnt_state is not None else None
        if state_gate is not None and rnnt_state is not None:
            gate = state_gate.astype(jnp.float32)
            zero_hc = lambda hc: tuple(
                (h * gate[None, :, None].astype(h.dtype)) for h in hc
            )
            enc_state = EncoderState(
                pre_rnn=zero_hc(enc_state.pre_rnn), post_rnn=zero_hc(enc_state.post_rnn)
            )
            pn_state = PredNetState(
                next_to_last_pred_state=zero_hc(pn_state.next_to_last_pred_state),
                last_token=pn_state.last_token,
            )

        f, f_lens, new_enc_state = self.encode(
            params, x, x_lens, enc_state, train=train, rng=rngs[0],
            bn_updates=bn_updates,
        )
        g, _, all_pred_hid = self.predict(
            params,
            y,
            pred_state=pn_state.next_to_last_pred_state if pn_state is not None else None,
            add_sos=True,
            special_sos=pn_state.last_token if pn_state is not None else None,
            sos_gate=state_gate,
            train=train,
            rng=rngs[1],
            bn_updates=bn_updates,
        )
        g_lens = y_lens + 1
        new_pn_state = _get_pred_net_state(y, all_pred_hid, y_lens)
        new_state = RNNTState(enc_state=new_enc_state, pred_net_state=new_pn_state)
        return (f, f_lens), (g, g_lens), new_state

    @property
    def has_batch_norm(self) -> bool:
        return self.cfg.enc_batch_norm or self.cfg.pred_batch_norm

    def bn_stats(self, params: Params) -> tuple:
        """Extract (mean, var) running stats in the same traversal order
        apply_bn_updates consumes."""
        out = []
        for stack in (
            params["encoder"]["pre_rnn"],
            params["encoder"]["post_rnn"],
            params["prediction"]["dec_rnn"],
        ):
            for i in range(len(stack)):
                lp = stack[f"layer_{i}"]
                if "bn" in lp:
                    out.append((lp["bn"]["mean"], lp["bn"]["var"]))
        return tuple(out)

    def apply_bn_updates(self, params: Params, updates: list) -> Params:
        """Write collected batch-norm running-stat updates back into a new
        params tree. ``updates`` is the list filled by enc_pred's
        ``bn_updates`` collector: (mean, var) pairs in traversal order —
        encoder.pre_rnn layers, encoder.post_rnn layers, prediction.dec_rnn
        layers (only stacks that have BN)."""
        if not updates:
            return params
        params = jax.tree.map(lambda x: x, params)  # shallow-copy containers
        it = iter(updates)
        for stack in (
            params["encoder"]["pre_rnn"],
            params["encoder"]["post_rnn"],
            params["prediction"]["dec_rnn"],
        ):
            for i in range(len(stack)):
                lp = stack[f"layer_{i}"]
                if "bn" in lp:
                    mean, var = next(it)
                    lp["bn"] = dict(lp["bn"], mean=mean, var=var)
        rest = list(it)
        assert not rest, f"{len(rest)} unconsumed bn updates"
        return params

    def param_lr_factors(self) -> Dict[str, float]:
        cfg = self.cfg
        return {
            "encoder": cfg.enc_lr_factor,
            "prediction": cfg.pred_lr_factor,
            "joint_enc": cfg.joint_enc_lr_factor,
            "joint_pred": cfg.joint_pred_lr_factor,
            "joint_fc": cfg.joint_net_lr_factor,
        }


def _last_nonpadded_state(all_h, all_c, lens):
    """Gather per-sample state at t = len - 1. all_h: [L, T, B, H]."""
    idx = jnp.maximum(lens.astype(jnp.int32) - 1, 0)  # [B]
    h = jnp.take_along_axis(all_h, idx[None, None, :, None], axis=1).squeeze(1)
    c = jnp.take_along_axis(all_c, idx[None, None, :, None], axis=1).squeeze(1)
    return h, c  # [L, B, H]


def _get_pred_net_state(y, all_pred_hid, y_lens) -> PredNetState:
    """Streaming pred-net state (reference: train_utils/rsp.py:103-205).

    The state to carry into the next segment is the LSTM state *before* the
    last token (position y_lens - 1 of the SOS-prefixed sequence = after
    consuming all but the last label), plus the last token itself, which is
    re-embedded as the next segment's SOS.
    """
    all_h, all_c = all_pred_hid  # [L, U+1, B, H]
    idx = jnp.maximum(y_lens.astype(jnp.int32) - 1, 0)
    h = jnp.take_along_axis(all_h, idx[None, None, :, None], axis=1).squeeze(1)
    c = jnp.take_along_axis(all_c, idx[None, None, :, None], axis=1).squeeze(1)
    B = y.shape[0]
    last_tok = jnp.take_along_axis(
        y, jnp.maximum(y_lens.astype(jnp.int32) - 1, 0)[:, None], axis=1
    )  # [B, 1]
    return PredNetState(next_to_last_pred_state=(h, c), last_token=last_tok)
