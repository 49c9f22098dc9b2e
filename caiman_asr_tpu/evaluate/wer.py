"""Word/char error rate (reference: evaluate/metrics.py, error_rates.py).

The reference uses the levenshtein_rs Rust pip package; a vectorised
numpy band DP is plenty fast on host here (O(len1*len2) ints per pair,
batched over utterances).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional, Sequence, Tuple

import numpy as np

from caiman_asr_tpu.data.text.normalize import standardize_text


class ErrorRateKind(Enum):
    WORD = "word"
    CHAR = "char"
    MIXTURE = "mixture"  # per-word chunks of chars (for e.g. Mandarin mixes)


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance between two sequences.

    Hot path uses the native C++ kernel (caiman_asr_tpu.native, the
    replacement for the reference's levenshtein_rs dep,
    evaluate/metrics.py:21) by interning units to int ids; falls back to the
    numpy row DP if the native build is unavailable.
    """
    try:
        from caiman_asr_tpu.native import levenshtein as _native_lev

        ids: dict = {}
        enc = lambda seq: [ids.setdefault(u, len(ids)) for u in seq]
        ea = enc(a)
        return _native_lev(ea, enc(b))
    except Exception:
        pass
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    b_arr = np.array(b, dtype=object)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, start=1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (b_arr != ca)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # Deletion chain cur[j] = min(cur[j], cur[j-1] + 1) is a prefix-min of
        # (cur[j] - j): min over k<=j of cur[k] + (j-k) = j + cummin(cur - idx).
        idx = np.arange(len(b) + 1)
        cur = np.minimum.accumulate(cur - idx) + idx
        prev = cur
    return int(prev[-1])


def _units(text: str, kind: ErrorRateKind) -> List[str]:
    if kind == ErrorRateKind.WORD:
        return text.split()
    if kind == ErrorRateKind.CHAR:
        return list(text)
    # mixture: split words, then alphanumeric words stay whole while CJK-ish
    # chars are separate units.
    units: List[str] = []
    for w in text.split():
        if w.isascii():
            units.append(w)
        else:
            units.extend(list(w))
    return units


@dataclass
class WERResult:
    wer: float
    scores: int  # total edit distance
    num_words: int


def word_error_rate(
    hypotheses: Sequence[str],
    references: Sequence[str],
    standardize: bool = False,
    kind: ErrorRateKind = ErrorRateKind.WORD,
) -> WERResult:
    """Corpus-level error rate (reference: evaluate/metrics.py:21-80)."""
    assert len(hypotheses) == len(references), "hyp/ref count mismatch"
    dist = 0
    words = 0
    for hyp, ref in zip(hypotheses, references):
        if standardize:
            hyp, ref = standardize_text(hyp), standardize_text(ref)
        h, r = _units(hyp, kind), _units(ref, kind)
        dist += levenshtein(h, r)
        words += len(r)
    wer = dist / max(words, 1)
    return WERResult(wer=wer, scores=dist, num_words=words)
