"""CTM export + emission-latency measurement
(reference: latency/ctm.py:22-249, latency/measure_latency.py).

CTM lines: ``<recording_id> <channel> <start> <duration> <word>``.
Emission latency for a correctly-recognised word = (time the model emitted
it) − (ground-truth end time from a forced-alignment CTM). Words are paired
by difflib alignment of the normalized word sequences; substitutions can be
included optionally (reference measure_latency.py:163-295).
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass
from pathlib import Path
from statistics import mean, median
from typing import Dict, List, Optional, Tuple

from caiman_asr_tpu.latency.timestamp import (
    EOS,
    Never,
    SequenceTimestamp,
    Silence,
    Termination,
    frame_to_time,
)


@dataclass
class CTMTimestamp:
    word: str
    beg_time: float
    end_time: float
    filename: str


def to_ctm(
    seq_time: SequenceTimestamp, output_fp: str, audio_fp: str, frame_width: float
):
    with open(output_fp, "a") as fh:
        for w in seq_time.seqs:
            wt = frame_to_time(w, frame_width)
            fh.write(
                f"{audio_fp} 1 {wt.start_time:.3f} {wt.end_time - wt.start_time:.3f} "
                f"{w.word} \n"
            )


def dump_ctm(
    flist: List[str],
    lst_seq_time: List[SequenceTimestamp],
    ctm_fpath: str,
    frame_width: float,
) -> Dict[str, Termination]:
    Path(ctm_fpath).write_text("")  # make repeatable
    for seq, fname in zip(lst_seq_time, flist):
        to_ctm(seq, ctm_fpath, fname, frame_width)
    return {f: s.eos for f, s in zip(flist, lst_seq_time)}


def load_ctm(ctm_file_path: str) -> List[CTMTimestamp]:
    out = []
    with open(ctm_file_path) as fh:
        for ln, line in enumerate(fh):
            parts = line.split()
            if not parts:
                continue
            if len(parts) < 5:
                raise ValueError(f"{ctm_file_path}:{ln}: bad CTM line: {line!r}")
            fname, _, beg, dur, word = parts[:5]
            out.append(
                CTMTimestamp(
                    word=word.lower(),
                    beg_time=float(beg),
                    end_time=float(beg) + float(dur),
                    filename=fname,
                )
            )
    return out


def _by_file(ctm: List[CTMTimestamp]) -> Dict[str, List[CTMTimestamp]]:
    files: Dict[str, List[CTMTimestamp]] = {}
    for t in ctm:
        files.setdefault(t.filename, []).append(t)
    return files


def align_ctm_files(
    gt_ctm: List[CTMTimestamp],
    model_ctm: List[CTMTimestamp],
    include_subs: bool = False,
) -> List[float]:
    """Per matched word: model emission time − ground-truth word end time."""
    gt_files = _by_file(gt_ctm)
    pr_files = _by_file(model_ctm)
    latencies: List[float] = []
    for fname, gts in gt_files.items():
        prs = pr_files.get(fname)
        if not prs:
            continue
        gt_words = [t.word for t in gts]
        pr_words = [t.word for t in prs]
        sm = difflib.SequenceMatcher(a=gt_words, b=pr_words, autojunk=False)
        for op, a0, a1, b0, b1 in sm.get_opcodes():
            if op == "equal":
                for i, j in zip(range(a0, a1), range(b0, b1)):
                    latencies.append(prs[j].end_time - gts[i].end_time)
            elif op == "replace" and include_subs:
                for i, j in zip(range(a0, a1), range(b0, b1)):
                    latencies.append(prs[j].end_time - gts[i].end_time)
    return latencies


def latency_stats(
    latencies: List[float], frame_width: float = 0.0
) -> Dict[str, Optional[float]]:
    """Summary stats; the expected half-frame wait can be subtracted via
    frame_width (reference measure_latency.py:120-160)."""
    if not latencies:
        return {"mean": None, "median": None, "p90": None, "p99": None, "n": 0}
    adj = [l - frame_width / 2.0 for l in latencies]
    s = sorted(adj)

    def pct(p):
        k = min(len(s) - 1, max(0, round(p * (len(s) - 1))))
        return s[k]

    return {
        "mean": mean(adj),
        "median": median(adj),
        "p90": pct(0.90),
        "p99": pct(0.99),
        "n": len(adj),
    }


def measure_emission_latency(
    gt_ctm_path: str,
    model_ctm_path: str,
    include_subs: bool = False,
    frame_width: float = 0.0,
) -> Dict[str, Optional[float]]:
    latencies = align_ctm_files(
        load_ctm(gt_ctm_path), load_ctm(model_ctm_path), include_subs
    )
    return latency_stats(latencies, frame_width)
