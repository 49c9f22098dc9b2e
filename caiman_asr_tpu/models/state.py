"""Streaming state dataclasses (reference: rnnt/state.py:13-38).

Registered as pytrees so they can flow through jit/scan/pjit unchanged.
All leaves have static shapes: hidden/cell states are [L, B, H]; the
prediction net additionally carries the last emitted token [B, 1] used as the
next segment's "special SOS" embedding.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class EncoderState:
    def __init__(self, pre_rnn: Tuple[jax.Array, jax.Array], post_rnn: Tuple[jax.Array, jax.Array]):
        self.pre_rnn = pre_rnn
        self.post_rnn = post_rnn

    def tree_flatten(self):
        return ((self.pre_rnn, self.post_rnn), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@register_pytree_node_class
class PredNetState:
    def __init__(self, next_to_last_pred_state: Tuple[jax.Array, jax.Array], last_token: jax.Array):
        self.next_to_last_pred_state = next_to_last_pred_state
        self.last_token = last_token

    def tree_flatten(self):
        return ((self.next_to_last_pred_state, self.last_token), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@register_pytree_node_class
class RNNTState:
    def __init__(self, enc_state: EncoderState, pred_net_state: PredNetState):
        self.enc_state = enc_state
        self.pred_net_state = pred_net_state

    def tree_flatten(self):
        return ((self.enc_state, self.pred_net_state), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
