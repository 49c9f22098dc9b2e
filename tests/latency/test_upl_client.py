"""User-perceived-latency primitives: the client-side partial/final fusion
(latency/client.py, reference latency/client.py:1-67) and the model-side
fuse_partials (decoding/response.py, reference utils/responses.py:39-155).

Both implement the same visibility rule, so they are cross-checked against
each other on the same scripted stream."""

from caiman_asr_tpu.decoding.response import (
    DecodingResponse,
    FrameResponses,
    HypothesisResponse,
    frame_responses_timesteps,
    fuse_partials,
)
from caiman_asr_tpu.latency.client import (
    ServerResponse,
    fuse_timestamps,
    get_word_timestamps,
)


def test_fuse_surviving_partial_prefix_counts():
    # "ab c" visible from t=1 as a partial, final at t=5: chars keep t=1
    rs = [
        ServerResponse("ab c", 1.0, True),
        ServerResponse("ab c", 5.0, False),
    ]
    assert fuse_timestamps(rs) == [
        ("a", 1.0), ("b", 1.0), (" ", 1.0), ("c", 1.0)
    ]
    assert get_word_timestamps(rs) == [("ab", 1.0), ("c", 1.0)]


def test_fuse_overwritten_partial_does_not_count():
    # partial "ax" at t=1 disagrees at position 1; partial "ab" at t=2
    # agrees: 'a' visible since t=1, 'b' only since t=2
    rs = [
        ServerResponse("ax", 1.0, True),
        ServerResponse("ab", 2.0, True),
        ServerResponse("ab", 5.0, False),
    ]
    assert fuse_timestamps(rs) == [("a", 1.0), ("b", 2.0)]
    assert get_word_timestamps(rs) == [("ab", 2.0)]


def test_fuse_flicker_breaks_the_chain():
    # 'a' shown at t=1, overwritten by 'x' at t=2, back to 'a' at t=3:
    # continuous visibility only from t=3
    rs = [
        ServerResponse("a", 1.0, True),
        ServerResponse("x", 2.0, True),
        ServerResponse("a", 3.0, True),
        ServerResponse("a", 5.0, False),
    ]
    assert fuse_timestamps(rs) == [("a", 3.0)]


def test_fuse_short_partial_skipped():
    # the short partial at t=2 never overwrote position 1 on screen, so
    # 'b' stays visible from the longer t=1 partial
    rs = [
        ServerResponse("ab", 1.0, True),
        ServerResponse("a", 2.0, True),
        ServerResponse("ab", 5.0, False),
    ]
    assert fuse_timestamps(rs) == [("a", 1.0), ("b", 1.0)]


def test_fuse_tail_carries_to_next_final():
    # reference docstring example: partial runs ahead of the first final;
    # its uncommitted tail keeps its arrival time for the second final
    rs = [
        ServerResponse("abcde", 1.0, True),
        ServerResponse("abc", 2.0, False),
        ServerResponse("de", 5.0, False),
    ]
    fused = fuse_timestamps(rs)
    assert fused == [
        ("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 1.0), ("e", 1.0)
    ]


def _resp(frame, toks=None, pieces=None, partial_pieces=None, ts=None):
    final = None
    if toks is not None:
        final = DecodingResponse(
            start_frame_idx=frame, duration_frames=1, is_provisional=False,
            alternatives=[HypothesisResponse(
                y_seq=toks, timesteps=ts or [frame] * len(toks),
                token_seq=pieces, confidence=[1.0] * len(toks),
            )],
        )
    partials = None
    if partial_pieces is not None:
        partials = DecodingResponse(
            start_frame_idx=frame, duration_frames=1, is_provisional=True,
            alternatives=[HypothesisResponse(
                y_seq=list(range(len(partial_pieces))),
                timesteps=[frame] * len(partial_pieces),
                token_seq=partial_pieces,
                confidence=[1.0] * len(partial_pieces),
            )],
        )
    return FrameResponses(partials=partials, final=final)


def test_fuse_partials_reference_example():
    """The reference utils/responses.py docstring scenario: partials
    'abcde' then 'abc12 3', final 'abc1e' — a,b,c from the first partial,
    1 from the second, e at the final."""
    resp = {
        0: _resp(0, partial_pieces=list("abcde")),
        1: _resp(1, partial_pieces=list("abc123")),
        2: _resp(2, toks=[0, 1, 2, 3, 4], pieces=list("abc1e"),
                 ts=[0, 0, 0, 1, 2]),
    }
    fused = fuse_partials(resp)
    assert frame_responses_timesteps(fused) == [0, 0, 0, 1, 2]
    # model clock untouched on the original
    assert frame_responses_timesteps(resp) == [0, 0, 0, 1, 2]


def test_fuse_partials_multichar_token_needs_all_chars():
    # token "ab": 'a' visible from frame 0, 'b' only from frame 1 -> the
    # token's user-perceived frame is 1 (max over its characters)
    resp = {
        0: _resp(0, partial_pieces=["a"]),
        1: _resp(1, partial_pieces=["ab"]),
        2: _resp(2, toks=[7], pieces=["ab"], ts=[0]),
    }
    fused = fuse_partials(resp)
    assert frame_responses_timesteps(fused) == [1]


def test_fuse_partials_no_partials_stamps_final_frame():
    # greedy/fast_beam offline: no partials; user clock = final arrival
    resp = {
        3: _resp(3, toks=[1, 2], pieces=["x", "y"], ts=[1, 2]),
    }
    fused = fuse_partials(resp)
    assert frame_responses_timesteps(fused) == [3, 3]


def test_client_and_model_fusion_agree():
    """The same scripted stream through both implementations yields the
    same per-character first-visible times."""
    script = [  # (frame, text, is_partial)
        (0, "he", True),
        (1, "hel", True),
        (2, "help", True),
        (3, "hel", False),
        (4, "p me", True),
        (5, "p me", False),
    ]
    client = [ServerResponse(t, float(f), p) for f, t, p in script]
    got_client = fuse_timestamps(client)

    resp = {}
    for f, t, p in script:
        if p:
            resp[f] = _resp(f, partial_pieces=list(t))
        else:
            resp[f] = _resp(f, toks=list(range(len(t))), pieces=list(t),
                            ts=[f] * len(t))
    got_model = frame_responses_timesteps(fuse_partials(resp))
    assert [ts for _, ts in got_client] == [float(x) for x in got_model]


def test_align_upl_scores_equal_words_only():
    """scripts/measure_upl._align_upl pairs hyp words to ground-truth end
    times by difflib alignment and scores only equal matches (reference
    measure_latency.py:163-295 scores correctly-recognised words)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "measure_upl",
        Path(__file__).parents[2] / "scripts" / "measure_upl.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    gt = [("order", 0.5), ("even", 1.0), ("though", 1.5), ("it", 2.0)]
    # substitution on "though" -> only the 3 equal words score
    words = [("order", 0.9), ("even", 1.3), ("tho", 1.9), ("it", 2.4)]
    upls = mod._align_upl(words, gt)
    assert [w for w, _ in upls] == ["order", "even", "it"]
    import numpy as np

    np.testing.assert_allclose([u for _, u in upls], [0.4, 0.3, 0.4])

    # deletion mid-stream still aligns the tail
    words = [("order", 0.9), ("it", 2.4)]
    upls = mod._align_upl(words, gt)
    assert [w for w, _ in upls] == ["order", "it"]
