"""Timestamp grouping + CTM + emission latency tests (reference: tests/latency/)."""

import pytest

from caiman_asr_tpu.latency.ctm import (
    dump_ctm,
    latency_stats,
    load_ctm,
    measure_emission_latency,
)
from caiman_asr_tpu.latency.timestamp import (
    EOS,
    Never,
    PerWordTimestamp,
    SequenceTimestamp,
    frame_to_time,
    group_timestamps,
)


def test_group_timestamps_words():
    # pieces with leading spaces as produced by detokenizing single ids
    subwords = [[" he", "llo", " wor", "ld"]]
    ts = [[2, 3, 5, 7]]
    out = group_timestamps(subwords, ts, ["hello world"], [Never()])
    seq = out[0].seqs
    assert [w.word for w in seq] == ["hello", "world"]
    assert (seq[0].start_frame, seq[0].end_frame) == (2, 3)
    assert (seq[1].start_frame, seq[1].end_frame) == (5, 7)


def test_frame_to_time_convention():
    wt = frame_to_time(PerWordTimestamp("cat", 2, 2), frame_width=0.06)
    assert wt.start_time == pytest.approx(0.12)
    assert wt.end_time == pytest.approx(0.18)  # known one frame later


def test_ctm_roundtrip_and_latency(tmp_path):
    seqs = [
        SequenceTimestamp(
            [PerWordTimestamp("hello", 2, 3), PerWordTimestamp("world", 5, 7)],
            EOS(final_time=0.5),
        )
    ]
    model_ctm = tmp_path / "model.ctm"
    terms = dump_ctm(["a.wav"], seqs, str(model_ctm), frame_width=0.06)
    assert isinstance(terms["a.wav"], EOS)
    loaded = load_ctm(str(model_ctm))
    assert [t.word for t in loaded] == ["hello", "world"]
    assert loaded[0].beg_time == pytest.approx(0.12)
    assert loaded[0].end_time == pytest.approx(0.24)

    # ground truth: words actually end earlier than model emission
    gt_ctm = tmp_path / "gt.ctm"
    gt_ctm.write_text(
        "a.wav 1 0.050 0.100 hello \na.wav 1 0.200 0.150 world \n"
    )
    stats = measure_emission_latency(str(gt_ctm), str(model_ctm))
    assert stats["n"] == 2
    # hello: 0.24 - 0.15 = 0.09; world: 0.48 - 0.35 = 0.13
    assert stats["mean"] == pytest.approx((0.09 + 0.13) / 2, abs=1e-6)
    assert stats["median"] == pytest.approx(0.11, abs=1e-6)


def test_latency_stats_empty():
    s = latency_stats([])
    assert s["n"] == 0 and s["mean"] is None


def test_alignment_skips_errors(tmp_path):
    gt = tmp_path / "gt.ctm"
    gt.write_text("f 1 0.0 0.1 aaa \nf 1 0.2 0.1 bbb \nf 1 0.4 0.1 ccc \n")
    pr = tmp_path / "pr.ctm"
    pr.write_text("f 1 0.0 0.2 aaa \nf 1 0.3 0.2 xxx \nf 1 0.5 0.2 ccc \n")
    stats = measure_emission_latency(str(gt), str(pr))
    assert stats["n"] == 2  # aaa + ccc; xxx/bbb substitution skipped
    stats_subs = measure_emission_latency(str(gt), str(pr), include_subs=True)
    assert stats_subs["n"] == 3
