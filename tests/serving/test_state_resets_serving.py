"""Serving state resets: shadow-lane handover on a live stream.

The router's contract, verified against the real engine:
  - pre-boundary responses are IDENTICAL to a no-SR engine on the same
    audio (the primary lane is untouched until handover);
  - post-boundary responses equal a fresh lane decoding from
    ``boundary - overlap`` with its warmup-window output dropped (the
    offline state-resets semantics, evaluate/state_resets.py);
  - timestamps are stream-absolute across the handover;
  - lanes: a second lane is held only during the overlap window, the old
    lane is freed after the swap, EOS is forwarded exactly once.
"""

import jax
import numpy as np
import pytest

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.serving.engine import StreamingEngine
from caiman_asr_tpu.serving.state_resets import StateResetRouter

N_CLASSES = 12
BLANK = N_CLASSES - 1
HOP = 960
FS = 0.06


class Tok:
    def detokenize(self, ids):
        return "".join(chr(97 + i) for i in ids)

    def id_to_piece(self, i):
        return chr(97 + i)


@pytest.fixture(scope="module")
def setup():
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16, enc_dropout=0.0,
            pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    mel_stats = (
        rng.normal(size=80).astype(np.float32) * 0.1 - 8.0,
        np.abs(rng.normal(size=80)).astype(np.float32) + 0.5,
    )
    return model, params, mel_stats


def _audio(n_ticks):
    rng = np.random.default_rng(7)
    a = (rng.normal(size=HOP * n_ticks) * 0.1).astype(np.float32)
    return (np.rint(a * 32768.0) / 32768.0).astype(np.float32)


def _msgs(resp):
    return resp if isinstance(resp, list) else [resp]


def _run_plain(setup, audio, n_ticks, collect_from_tick=0):
    """Transcript+timestamps of a plain engine lane over `audio`,
    dropping responses whose tick index is below collect_from_tick."""
    model, params, mel_stats = setup
    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=1,
        max_symbols_per_step=4, native_serializer=False,
    )
    lane = eng.open_stream()
    out_msgs = []
    for t in range(n_ticks):
        eng.push_audio(lane, audio[t * HOP: (t + 1) * HOP])
        out = eng.tick()
        if lane in out and t >= collect_from_tick:
            out_msgs.extend(
                m for m in _msgs(out[lane]) if "alternatives" in m
            )
    eng.close_stream(lane)
    out = eng.tick()
    if lane in out:
        out_msgs.extend(m for m in _msgs(out[lane]) if "alternatives" in m)
    return out_msgs


@pytest.mark.slow
def test_shadow_handover_matches_segmented_reference(setup):
    model, params, mel_stats = setup
    SEG, OVL = 6, 2            # ticks
    N = 10                     # total ticks of audio
    audio = _audio(N)

    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=3,
        max_symbols_per_step=4, native_serializer=False,
    )
    router = StateResetRouter(
        eng, segment_secs=SEG * FS, overlap_secs=OVL * FS
    )
    assert router.seg_ticks == SEG and router.ovl_ticks == OVL

    uid = router.open_stream()
    got = []
    lanes_during_overlap = 0
    eos_count = 0
    for t in range(N):
        router.push_audio(uid, audio[t * HOP: (t + 1) * HOP])
        out = router.tick()
        if SEG - OVL <= t < SEG:
            lanes_during_overlap = max(lanes_during_overlap, len(eng.streams))
        if uid in out:
            for m in _msgs(out[uid]):
                if m.get("eos"):
                    eos_count += 1
                else:
                    got.append(m)
    router.close_stream(uid)
    for _ in range(4):  # drain flush + retiring lanes
        out = router.tick()
        if uid in out:
            for m in _msgs(out[uid]):
                if m.get("eos"):
                    eos_count += 1
                else:
                    got.append(m)
    assert eos_count == 1
    assert not router.streams and not eng.streams  # all lanes freed
    assert lanes_during_overlap == 2  # shadow held only during overlap

    # reference: pre-boundary == plain engine; post-boundary == fresh lane
    # from (SEG - OVL) with its overlap-warmup responses dropped
    pre = [m for m in _run_plain(setup, audio[: SEG * HOP], SEG)]
    post = _run_plain(
        setup, audio[(SEG - OVL) * HOP:], N - SEG + OVL,
        collect_from_tick=OVL,
    )
    want = pre + post
    assert [m["alternatives"][0]["transcript"] for m in got] == [
        m["alternatives"][0]["transcript"] for m in want
    ]
    assert len(got) > 0

    # timestamps are stream-absolute: post-swap responses start at or
    # after the boundary minus one frame, never back at zero
    post_swap = got[len(pre):]
    if post_swap:
        assert min(m["start"] for m in post_swap) >= (SEG - 1) * FS - 1e-9
    # the plain reference's post-segment timestamps must agree too (the
    # shadow's frame clock was pre-based at SEG - OVL)
    for a, b in zip(post_swap, post):
        assert abs(a["start"] - (b["start"] + (SEG - OVL) * FS)) < 1e-9


def test_capacity_skip_slides_grid(setup):
    """With zero free lanes for a shadow, the reset cycle is skipped (grid
    slides one segment) and no audio is lost."""
    model, params, mel_stats = setup
    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=1,
        max_symbols_per_step=4, native_serializer=False,
    )
    router = StateResetRouter(eng, segment_secs=4 * FS, overlap_secs=1 * FS)
    uid = router.open_stream()
    audio = _audio(9)
    with pytest.warns(UserWarning, match="capacity"):
        for t in range(9):
            router.push_audio(uid, audio[t * HOP: (t + 1) * HOP])
            router.tick()
    s = router.streams[uid]
    assert s.shadow is None
    assert s.seg_k >= 2  # grid slid past the unservable boundary
    # every sample reached the primary lane (frames == ticks pushed)
    assert eng.lane_frames(s.primary) == 9


@pytest.mark.slow
def test_router_over_beam_engine(setup):
    """The router is decoder-agnostic: over a beam engine the handover
    completes, EOS is forwarded once, and every lane drains."""
    model, params, mel_stats = setup
    eng = StreamingEngine(
        model, params, BLANK, Tok(), mel_stats=mel_stats, max_streams=3,
        decoder="beam", beam_width=2, max_symbols_per_step=4,
        native_serializer=False,
    )
    router = StateResetRouter(eng, segment_secs=6 * FS, overlap_secs=2 * FS)
    uid = router.open_stream()
    audio = _audio(10)
    got, eos_count = [], 0
    for t in range(10):
        router.push_audio(uid, audio[t * HOP: (t + 1) * HOP])
        out = router.tick()
        for m in _msgs(out.get(uid, [])) if uid in out else []:
            if m.get("eos"):
                eos_count += 1
            else:
                got.append(m)
    assert router.streams[uid].seg_k >= 2  # at least one handover happened
    router.close_stream(uid)
    for _ in range(5):
        out = router.tick()
        for m in _msgs(out.get(uid, [])) if uid in out else []:
            if m.get("eos"):
                eos_count += 1
            else:
                got.append(m)
    assert eos_count == 1
    assert not router.streams and not eng.streams
    assert any("alternatives" in m for m in got)
    # stream-absolute timestamps continue past the boundary
    finals = [m for m in got if "alternatives" in m]
    assert max(m["end"] for m in finals) > 6 * FS
