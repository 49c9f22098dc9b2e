"""JSON manifest parsing and filtering.

Reference: data/dali/utils.py + data/dali/data_loader.py:137-255. Manifest
format: a JSON list of entries
  {"transcript": str, "files": [{"fname": ...}], "original_duration": float}.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence


@dataclass
class Utterance:
    fname: str
    transcript: str
    duration: float
    manifest_idx: int = 0


def load_manifest(
    path: str | Path,
    data_dir: Optional[str | Path] = None,
    max_duration: Optional[float] = None,
    min_duration: Optional[float] = None,
    max_transcript_len: Optional[int] = None,
    manifest_idx: int = 0,
) -> List[Utterance]:
    """Load one manifest, applying the reference's utterance filters
    (max/min duration, max transcript length; data_loader.py:94-110)."""
    with open(path) as f:
        entries = json.load(f)
    root = Path(data_dir) if data_dir is not None else Path(path).parent
    out = []
    for e in entries:
        dur = float(e.get("original_duration") or e["files"][0].get("duration", 0.0))
        txt = e["transcript"]
        if max_duration is not None and dur > max_duration:
            continue
        if min_duration is not None and dur < min_duration:
            continue
        if max_transcript_len is not None and len(txt) > max_transcript_len:
            continue
        fname = e["files"][0]["fname"]
        out.append(
            Utterance(
                fname=str(root / fname),
                transcript=txt,
                duration=dur,
                manifest_idx=manifest_idx,
            )
        )
    return out


def load_manifests(paths: Sequence[str | Path], **kw) -> List[Utterance]:
    utts: List[Utterance] = []
    for i, p in enumerate(paths):
        utts.extend(load_manifest(p, manifest_idx=i, **kw))
    return utts
