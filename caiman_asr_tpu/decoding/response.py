"""Decoding response wire schema.

This is the public contract shared with the streaming server / clients
(reference: rnnt/response.py and docs/src/inference/websocket_api.md).
Greedy decoding emits only finals; beam decoding emits partials each frame
plus finals once all beam hypotheses share a common prefix.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class HypothesisResponse:
    y_seq: List[int]
    timesteps: List[int]
    token_seq: List[str]
    confidence: List[float]


@dataclass
class DecodingResponse:
    start_frame_idx: int
    duration_frames: int
    is_provisional: bool
    alternatives: List[HypothesisResponse]


@dataclass
class FrameResponses:
    partials: Optional[DecodingResponse]
    final: Optional[DecodingResponse]


def frame_responses_to_tokens(responses: Dict[int, FrameResponses]) -> List[int]:
    """Concatenate final y_seqs in frame order (greedy transcript)."""
    out: List[int] = []
    for t in sorted(responses):
        fr = responses[t]
        if fr.final is not None and fr.final.alternatives:
            out.extend(fr.final.alternatives[0].y_seq)
    return out


def frame_responses_timesteps(responses: Dict[int, FrameResponses]) -> List[int]:
    out: List[int] = []
    for t in sorted(responses):
        fr = responses[t]
        if fr.final is not None and fr.final.alternatives:
            out.extend(fr.final.alternatives[0].timesteps)
    return out
