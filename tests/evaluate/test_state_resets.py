"""State-resets tests mirroring the reference's documented examples
(evaluate/state_resets/overlap_processing.py doctests + tests/evaluate/)."""

import numpy as np
import pytest

from caiman_asr_tpu.evaluate.state_resets import (
    StateResetsConfig,
    group_segment_lanes,
    merge_segments,
    segment_batch,
)


def test_config_validation():
    with pytest.raises(ValueError):
        StateResetsConfig.from_seconds(0.0, 0.0, 0.03, 2)
    with pytest.raises(ValueError):
        StateResetsConfig.from_seconds(3.0, 3.0, 0.03, 2)
    cfg = StateResetsConfig.from_seconds(15.0, 3.0, 0.03, 2)
    assert cfg.segment_frames == 500
    assert cfg.overlap_frames == 100


def test_segment_batch_shapes():
    cfg = StateResetsConfig(segment_frames=26, overlap_frames=6, enc_time_reduction=2)
    T, B, F = 60, 2, 4
    feats = np.arange(T * B * F, dtype=np.float32).reshape(T, B, F)
    lens = np.array([60, 20], np.int32)
    seg, seg_lens, counts = segment_batch(feats, lens, cfg)
    # utt0: frames 60 > 26 -> 1 + ceil(34/20) = 3 segments; utt1 whole
    assert counts == [3, 1]
    assert seg.shape == (26, 4, 4)
    np.testing.assert_array_equal(seg_lens, [26, 26, 20, 20])
    # second segment starts at frame 20 (segment - overlap)
    np.testing.assert_array_equal(seg[0, 1], feats[20, 0])
    assert group_segment_lanes(counts) == [(0, 3), (3, 4)]


def test_merge_reference_example():
    """The example from overlap_processing.py:67-104: overlap region drops
    token '2'; lookahead drops '6' and '5'."""
    cfg = StateResetsConfig(
        segment_frames=6, overlap_frames=2, enc_time_reduction=1, lookahead=3
    )
    pred = [[7, 2, 3, 6, 5], [2, 6, 5, 9, 7]]
    ts = [[1, 2, 3, 4, 6], [1, 3, 4, 5, 6]]
    toks, t, _ = merge_segments(pred, ts, None, cfg)
    assert toks == [7, 2, 3, 6, 5, 9, 7]
    # shifted: step_dur = (6-2)/1 = 4; second segment ts 5, 6 -> 9, 10
    assert t == [1, 2, 3, 4, 6, 9, 10]


def test_process_time_example():
    """Timestamp shifting example (overlap_processing.py:15-42)."""
    cfg = StateResetsConfig(
        segment_frames=26, overlap_frames=6, enc_time_reduction=2, lookahead=0
    )
    # distinct tokens so no dedup; overlap drops ts < ceil(6/2)=3
    pred = [[1, 2, 3, 4, 5], [10, 11, 12, 13], [20, 21]]
    ts = [[1, 3, 5, 6, 10], [3, 5, 7, 8], [3, 4]]
    toks, t, _ = merge_segments(pred, ts, None, cfg)
    assert t == [1, 3, 5, 6, 10, 13, 15, 17, 18, 23, 24]
    assert toks == [1, 2, 3, 4, 5, 10, 11, 12, 13, 20, 21]


def test_probs_follow_tokens():
    cfg = StateResetsConfig(
        segment_frames=6, overlap_frames=2, enc_time_reduction=1, lookahead=3
    )
    pred = [[7, 3], [3, 9]]
    ts = [[1, 4], [2, 5]]
    probs = [[0.9, 0.8], [0.7, 0.6]]
    toks, t, p = merge_segments(pred, ts, probs, cfg)
    assert toks == [7, 3, 9]
    assert p == [0.9, 0.8, 0.6]
