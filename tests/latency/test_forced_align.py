"""RNN-T Viterbi forced-alignment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.latency.forced_align import _viterbi_lattice, viterbi_alignment
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.ops.transducer_loss import NEG_INF


def test_viterbi_simple_lattice():
    """Hand-built 3x(2+1) lattice where the best path is emit@0, emit@2."""
    T, U = 3, 2
    null = np.zeros((T, U + 1))
    emit = np.full((T, U + 1), -10.0)
    emit[0, 0] = -0.1  # token 0 at frame 0
    emit[2, 1] = -0.1  # token 1 at frame 2
    frames = _viterbi_lattice(null, emit, T, U)
    np.testing.assert_array_equal(frames, [0, 2])


def test_viterbi_monotonic_and_complete():
    rng = np.random.default_rng(0)
    T, U = 12, 5
    null = rng.normal(size=(T, U + 1))
    emit = rng.normal(size=(T, U + 1))
    frames = _viterbi_lattice(null, emit, T, U)
    assert len(frames) == U
    assert all(frames[i] <= frames[i + 1] for i in range(U - 1))
    assert 0 <= frames[0] and frames[-1] < T


def test_model_alignment_shapes():
    model = RNNT(
        RNNTModelConfig(
            in_feats=8, enc_n_hid=12, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=12,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        10,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(16, 2, 8)), jnp.float32)
    lens = jnp.asarray([16, 12], jnp.int32)
    tokens = np.array([[1, 2, 3, 0], [4, 5, 0, 0]], np.int32)
    tok_lens = np.array([3, 2], np.int32)
    out = viterbi_alignment(model, params, feats, lens, tokens, tok_lens, 9)
    assert len(out) == 2
    assert len(out[0]) == 3 and len(out[1]) == 2
    enc_frames = [8, 6]
    for b, frames in enumerate(out):
        assert all(0 <= f < enc_frames[b] for f in frames)
        assert all(frames[i] <= frames[i + 1] for i in range(len(frames) - 1))


def test_segmented_encode_alignment_matches_full():
    """Segment-wise stateful encoding is exact: alignment from concatenated
    segment encoder outputs == alignment from one full-sequence encode
    (the --segment_len path in generate_gt_ctm)."""
    from types import SimpleNamespace

    from caiman_asr_tpu.latency.generate_gt_ctm import _segmented_alignment

    model = RNNT(
        RNNTModelConfig(
            in_feats=8, enc_n_hid=12, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=12,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        10,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    T = 24
    feats = jnp.asarray(rng.normal(size=(T, 1, 8)), jnp.float32)
    lens = jnp.asarray([T], jnp.int32)
    tokens = np.array([[1, 2, 3, 4]], np.int32)
    tok_lens = np.array([4], np.int32)

    full = viterbi_alignment(model, params, feats, lens, tokens, tok_lens, 9)
    batch = SimpleNamespace(tokens=tokens, token_lens=tok_lens)
    seg = _segmented_alignment(
        model, params, feats, np.asarray(lens), batch, 9, seg_frames=8
    )
    np.testing.assert_array_equal(full[0], seg[0])
