"""Random State Passing (RSP) — train-time long-form simulation.

Reference: train_utils/rsp.py:22-205 + docs/src/training/state_resets.md.
The model's streaming state (LSTM hidden/cell + pred-net last token) is
carried across consecutive batches so the model learns to decode beyond its
training utterance lengths. A history counter sampled from
``--rsp_seq_len_freq`` decides how many batches are concatenated before the
state is dropped; RSP only activates after ``--rsp_delay`` steps (default =
warmup + hold + 3 half-lives, the reference's LR heuristic, rsp.py:22-44).

TPU design: the state is a fixed-shape pytree threaded through the
grad-accumulation scan of the jitted train step; whether a microbatch uses
the carried state is a traced per-microbatch 0/1 gate (no recompiles, no
host round-trip of the state between microbatches). Gradients do NOT flow
through carried state (stop_gradient — the reference detaches, since each
torch backward frees its graph).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.models.rnnt import RNNT
from caiman_asr_tpu.models.state import EncoderState, PredNetState, RNNTState


def is_rsp_on(seq_len_freq: List[int]) -> bool:
    """Non-zero frequency after the first element => concatenation happens."""
    return sum(seq_len_freq[1:]) > 0


def rsp_delay_default(warmup_steps: int, hold_steps: int, half_life_steps: int) -> int:
    """LR-schedule heuristic (reference rsp.py:22-44)."""
    return warmup_steps + hold_steps + 3 * half_life_steps


def zero_rnnt_state(model: RNNT, batch_size: int, dtype=jnp.float32) -> RNNTState:
    """A fixed-shape all-zeros state (equivalent to state=None when gated)."""
    cfg = model.cfg

    def hc(layers, hid):
        return (
            jnp.zeros((layers, batch_size, hid), dtype),
            jnp.zeros((layers, batch_size, hid), dtype),
        )

    return RNNTState(
        enc_state=EncoderState(
            pre_rnn=hc(cfg.enc_pre_rnn_layers, cfg.enc_n_hid),
            post_rnn=hc(cfg.enc_post_rnn_layers, cfg.enc_n_hid),
        ),
        pred_net_state=PredNetState(
            next_to_last_pred_state=hc(cfg.pred_rnn_layers, cfg.pred_n_hid),
            last_token=jnp.zeros((batch_size, 1), jnp.int32),
        ),
    )


class RSPController:
    """Host-side gate sequencer.

    ``gates(step, n_micro)`` returns the 0/1 gate per microbatch for the next
    train step: gate=1 means "continue from carried state". The internal
    counter decrements per microbatch and resamples from seq_len_freq when a
    history ends (reference generate_batch_history, rsp.py:68-76).
    """

    def __init__(
        self,
        seq_len_freq: List[int],
        delay: int,
        seed: int = 0,
    ):
        self.freq = list(seq_len_freq)
        self.delay = delay
        self.on = is_rsp_on(self.freq)
        self.rng = np.random.default_rng(seed)
        self.remaining = 0  # microbatches left in the current history
        self.fresh = True   # next microbatch starts a new history

    def _sample(self) -> int:
        probs = np.asarray(self.freq, np.float64)
        probs = probs / probs.sum()
        return int(self.rng.choice(len(self.freq), p=probs)) + 1

    def gates(self, step: int, n_micro: int) -> np.ndarray:
        gates = np.zeros(n_micro, np.float32)
        if not self.on:
            return gates
        for i in range(n_micro):
            if self.remaining == 0:
                self.remaining = self._sample()
                self.fresh = True
            gates[i] = 0.0 if (self.fresh or step < self.delay) else 1.0
            self.fresh = False
            self.remaining -= 1
        return gates

    def reset(self):
        """Drop the carried state (e.g. after a NaN batch, rsp.py:86-99)."""
        self.remaining = 0
        self.fresh = True

    def fast_forward(self, n_steps: int, n_micro: int):
        """Replay the gate stream steps [0, n_steps) consumed, so a
        ``--resume`` run's RNG/counter position matches the uninterrupted
        run's and recovery stays bit-exact. (Skipped-step resets are not
        replayed; a run that skipped batches diverged from the control
        run regardless.)"""
        for s in range(n_steps):
            self.gates(s, n_micro)
