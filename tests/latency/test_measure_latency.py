"""Tests for the CTM-vs-CTM emission-latency CLI and rich alignment
(reference: latency/measure_latency.py, measure_latency_lite.py)."""

import pytest

from caiman_asr_tpu.latency.ctm import (
    CTMTimestamp,
    align_transcripts,
    load_ctm,
)
from caiman_asr_tpu.latency.measure_latency import main, parse_args
from caiman_asr_tpu.latency.measure_latency_lite import compute_latency_metrics
from caiman_asr_tpu.latency.timestamp import EOS, Never, Silence


def _ctm(fname, words):
    """words: (word, beg, end) triples."""
    return [CTMTimestamp(w, b, e, fname) for w, b, e in words]


def test_compute_latency_metrics_keys_and_frame_width():
    m = compute_latency_metrics(
        latencies=[0.1, 0.2, 0.3, 0.4],
        sil_latency=[0.5, 0.7],
        eos_latency=[0.9],
        frame_width=0.06,
    )
    # reference key names
    assert m["mean-SIL-latency"] == pytest.approx(0.6)
    assert m["median-EOS-latency"] == pytest.approx(0.9)
    # half a frame width subtracted from emission latencies
    assert m["mean-emission-latency"] == pytest.approx(0.25 - 0.03)
    assert m["p99-emission-latency"] == pytest.approx(0.4 - 0.03)
    assert "stdev-emission-latency" in m


def test_compute_latency_metrics_empty():
    assert compute_latency_metrics([], [], [], 0.0) == {}
    m = compute_latency_metrics([], [0.2], [], 0.0)
    assert set(m) == {"mean-SIL-latency", "median-SIL-latency",
                      "stdev-SIL-latency"}


def test_align_transcripts_endpoint_latencies():
    gt = _ctm("a", [("hello", 0.0, 0.2), ("world", 0.3, 0.5)])
    pr = _ctm("a", [("hello", 0.1, 0.3), ("world", 0.4, 0.6)])
    out = align_transcripts(
        gt, pr, last_emit_time={"a": EOS(final_time=0.9)}
    )
    assert out.latencies == pytest.approx([0.1, 0.1])
    assert out.end_times == pytest.approx([0.2, 0.5])
    # final words match -> EOS endpoint latency vs gt end of last word
    assert out.eos_latency == pytest.approx([0.9 - 0.5])
    assert out.sil_latency == []
    assert out.token_usage_rate == 1.0
    assert out.terminal_token_usage_rate == 1.0


def test_align_transcripts_silence_and_mismatched_final():
    gt = _ctm("a", [("one", 0.0, 0.2), ("two", 0.3, 0.5)])
    pr = _ctm("a", [("one", 0.1, 0.3), ("wrong", 0.4, 0.6)])
    out = align_transcripts(
        gt, pr, last_emit_time={"a": Silence(final_time=1.0)}
    )
    # final words differ -> no endpoint latency recorded
    assert out.sil_latency == [] and out.eos_latency == []
    assert out.terminal_token_usage_rate == 0.0
    # Never terminations record nothing either
    out2 = align_transcripts(
        _ctm("a", [("one", 0.0, 0.2)]),
        _ctm("a", [("one", 0.1, 0.3)]),
        last_emit_time={"a": Never()},
    )
    assert out2.sil_latency == [] and out2.eos_latency == []
    assert out2.terminal_token_usage_rate == 1.0


def test_align_transcripts_tags_excluded_and_norm():
    # tag words are stripped before alignment; words are normalized to the
    # basic charset so "Hello," matches "hello"
    gt = _ctm("a", [("Hello,", 0.0, 0.2), ("<eos>", 0.2, 0.2)])
    pr = _ctm("a", [("hello", 0.1, 0.3)])
    out = align_transcripts(gt, pr)
    assert out.latencies == pytest.approx([0.1])
    assert out.token_usage_rate == 1.0


def test_align_transcripts_whole_file_deletion_counts():
    """A gt file with no model output at all must still count in both
    usage-rate denominators (it is the exact failure these rates expose)."""
    gt = _ctm("a", [("one", 0.0, 0.2), ("two", 0.3, 0.5)]) + _ctm(
        "b", [("three", 0.0, 0.2), ("four", 0.3, 0.5)]
    )
    pr = _ctm("a", [("one", 0.1, 0.3), ("two", 0.4, 0.6)])  # nothing for b
    out = align_transcripts(gt, pr, last_emit_time={"a": EOS(final_time=0.9)})
    assert out.token_usage_rate == pytest.approx(0.5)  # 2 of 4 gt words
    assert out.terminal_token_usage_rate == pytest.approx(0.5)  # 1 of 2 utts


def test_align_transcripts_empty_normalized_words_dropped():
    """Digit/punctuation-only words normalize to '' and must not 'match'
    each other or count as ground-truth words."""
    gt = _ctm("a", [("1984", 0.0, 0.2), ("hello", 0.3, 0.5)])
    pr = _ctm("a", [("7", 0.0, 0.1), ("hello", 0.4, 0.6)])
    out = align_transcripts(gt, pr)
    # only the real word pair aligns; '1984' vs '7' is not a bogus match
    assert out.latencies == pytest.approx([0.1])
    assert out.token_usage_rate == 1.0  # 1 matched / 1 countable gt word


def test_percentile_nearest_rank():
    vals = [x / 10 for x in range(1, 11)]  # 0.1 .. 1.0
    m = compute_latency_metrics(vals, [], [], frame_width=None)
    # nearest-rank p90 of 10 values is the 9th value, not the max
    assert m["p90-emission-latency"] == pytest.approx(0.9)
    assert m["p99-emission-latency"] == pytest.approx(1.0)


def test_align_transcripts_replace_needs_equal_span():
    gt = _ctm("a", [("aa", 0.0, 0.1), ("bb", 0.2, 0.3), ("cc", 0.4, 0.5)])
    pr = _ctm("a", [("aa", 0.0, 0.2), ("xx", 0.3, 0.4), ("yy", 0.45, 0.5),
                    ("cc", 0.6, 0.7)])
    # bb -> xx yy is a 1->2 replace: skipped even with include_subs
    out = align_transcripts(gt, pr, include_subs=True)
    assert len(out.latencies) == 2  # aa + cc only


def test_timestamp_stats_offsets():
    gt = _ctm("a", [("w1", 0.0, 0.2), ("w2", 0.3, 0.5)])
    pr = _ctm("a", [("w1", 0.1, 0.3), ("w2", 0.4, 0.6)])
    out = align_transcripts(gt, pr, head_offset=0.1, tail_offset=0.1)
    ts = out.timestamp_stats
    assert ts["raw_AAS"] == pytest.approx(0.1)
    assert ts["fixed_AAS"] == pytest.approx(0.0, abs=1e-9)
    assert ts["optimal_head_offset"] == pytest.approx(0.1)
    assert ts["corrected_AAS"] == pytest.approx(0.0, abs=1e-9)
    assert ts["mean_word_time_gt"] == pytest.approx(0.2)


def test_measure_latency_cli(tmp_path):
    gt = tmp_path / "gt.ctm"
    gt.write_text("a.wav 1 0.00 0.20 hello \na.wav 1 0.30 0.20 world \n")
    pr = tmp_path / "model.ctm"
    pr.write_text("a.wav 1 0.10 0.20 hello \na.wav 1 0.40 0.20 world \n")
    img = tmp_path / "plot.png"
    args = parse_args([
        "--gt_ctm", str(gt), "--model_ctm", str(pr),
        "--frame_width", "0.06", "--output_img_path", str(img),
    ])
    metrics = main(args)
    assert metrics["mean-emission-latency"] == pytest.approx(0.1 - 0.03)
    assert img.exists() and img.stat().st_size > 0


def test_measure_latency_cli_rejects_bad_extension(tmp_path):
    gt = tmp_path / "gt.ctm"
    gt.write_text("a 1 0.0 0.1 x \n")
    args = parse_args([
        "--gt_ctm", str(gt), "--model_ctm", str(gt),
        "--output_img_path", str(tmp_path / "plot.jpg"),
    ])
    with pytest.raises(ValueError):
        main(args)


def test_load_ctm_still_roundtrips(tmp_path):
    f = tmp_path / "x.ctm"
    f.write_text("f 1 0.5 0.25 word \n")
    [t] = load_ctm(str(f))
    assert (t.beg_time, t.end_time, t.word) == (0.5, 0.75, "word")


def test_endpoint_latencies_from_terminations(tmp_path):
    """measure_emission_latency reports SIL/EOS endpoint stats when given
    real per-file terminations (reference latency/ctm.py:116-140): endpoint
    latency = termination time - ground-truth final word end, only counted
    when the final words match."""
    from caiman_asr_tpu.latency.ctm import measure_emission_latency
    from caiman_asr_tpu.latency.timestamp import EOS, Never, Silence

    gt = tmp_path / "gt.ctm"
    md = tmp_path / "model.ctm"
    gt.write_text(
        "a 1 0.00 0.50 hello\na 1 0.60 0.40 world\n"
        "b 1 0.00 0.50 good\nb 1 0.60 0.40 morning\n"
        "c 1 0.00 0.50 yes\n"
    )
    md.write_text(
        "a 1 0.10 0.50 hello\na 1 0.70 0.40 world\n"
        "b 1 0.10 0.50 good\nb 1 0.70 0.40 morning\n"
        "c 1 0.10 0.50 no\n"  # final word mismatch: no endpoint sample
    )
    terms = {"a": Silence(2.0), "b": EOS(1.5), "c": Never()}
    m = measure_emission_latency(str(gt), str(md), last_emit_time=terms)
    assert m["mean-SIL-latency"] == pytest.approx(2.0 - 1.0)
    assert m["mean-EOS-latency"] == pytest.approx(1.5 - 1.0)
    # endpoint counted for a and b only (c's final word mismatched)
    assert m["terminal_token_usage_rate"] == pytest.approx(2 / 3)
