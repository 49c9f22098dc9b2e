"""Forced alignment for ground-truth CTM generation.

The reference shells out to torchaudio's bundled CTC aligner
(latency/forced_align.py:413). TPU-native replacement: **Viterbi alignment
through the RNN-T lattice itself** — the same (t, u) recursion as the
transducer loss with max-plus algebra instead of log-sum-exp, plus a
backtrace. Any trained RNN-T checkpoint can then align its own training
data; no external CTC model needed.

viterbi_alignment returns, per utterance, the frame at which each target
token is emitted on the most probable monotonic path.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from caiman_asr_tpu.ops.transducer_loss import NEG_INF, joint_lattice_scores


def _viterbi_lattice(null: np.ndarray, emit: np.ndarray, T: int, U: int):
    """Max-plus forward + backtrace for one utterance.

    null, emit: [Tmax, Umax+1] masked scores. Returns frame index per token.
    """
    alpha = np.full((T, U + 1), NEG_INF, np.float64)
    # move[t, u]: 0 = came via blank from (t-1, u); 1 = via emit from (t, u-1)
    move = np.zeros((T, U + 1), np.int8)
    alpha[0, 0] = 0.0
    for u in range(1, U + 1):
        alpha[0, u] = alpha[0, u - 1] + emit[0, u - 1]
        move[0, u] = 1
    for t in range(1, T):
        alpha[t, 0] = alpha[t - 1, 0] + null[t - 1, 0]
        for u in range(1, U + 1):
            via_blank = alpha[t - 1, u] + null[t - 1, u]
            via_emit = alpha[t, u - 1] + emit[t, u - 1]
            if via_emit >= via_blank:
                alpha[t, u] = via_emit
                move[t, u] = 1
            else:
                alpha[t, u] = via_blank
    # backtrace from (T-1, U)
    frames = np.zeros(U, np.int64)
    t, u = T - 1, U
    while u > 0:
        if move[t, u] == 1:
            frames[u - 1] = t
            u -= 1
        else:
            t -= 1
    return frames


def viterbi_alignment(
    model,
    params,
    feats,
    feat_lens,
    tokens: np.ndarray,
    token_lens: np.ndarray,
    blank_idx: int,
) -> List[np.ndarray]:
    """Align target tokens to encoder frames via the RNN-T lattice.

    feats: [T, B, F] time-major features; tokens [B, U]. Returns a list of
    per-utterance frame-index arrays (length = token_lens[b]).
    """
    (f, f_lens), (g, _), _ = model.enc_pred(
        params, feats, feat_lens, jnp.asarray(tokens), jnp.asarray(token_lens),
        train=False,
    )
    return viterbi_alignment_from_enc(
        model, params, f, f_lens, g, tokens, token_lens, blank_idx
    )


def viterbi_alignment_from_enc(
    model,
    params,
    f,
    f_lens,
    g,
    tokens: np.ndarray,
    token_lens: np.ndarray,
    blank_idx: int,
) -> List[np.ndarray]:
    """Alignment from precomputed encoder output f [B, T', Hj] and
    prediction output g [B, U+1, Hj] (segment-wise encoding feeds this)."""
    logits = model.joint(params, f, g)  # [B, T, U+1, K]
    null, emit = joint_lattice_scores(
        logits, jnp.asarray(tokens), f_lens, jnp.asarray(token_lens), blank_idx
    )
    null, emit = np.asarray(null, np.float64), np.asarray(emit, np.float64)
    f_lens = np.asarray(f_lens)
    out = []
    for b in range(null.shape[0]):
        T, U = int(f_lens[b]), int(token_lens[b])
        out.append(_viterbi_lattice(null[b], emit[b], T, U))
    return out


def alignment_to_ctm_entries(
    frames: np.ndarray,
    tokens: List[int],
    tokenizer,
    frame_width: float,
) -> List[Tuple[float, float, str]]:
    """Group aligned token frames into word-level (start, end, word) rows."""
    from caiman_asr_tpu.latency.timestamp import Never, group_timestamps

    pieces = [tokenizer.id_to_piece(t).replace("▁", " ") for t in tokens]
    sentence = tokenizer.detokenize(tokens)
    seqs = group_timestamps([pieces], [list(map(int, frames))], [sentence], [Never()])
    rows = []
    for w in seqs[0].seqs:
        start = w.start_frame * frame_width
        end = (w.end_frame + 1) * frame_width
        rows.append((start, end, w.word))
    return rows
