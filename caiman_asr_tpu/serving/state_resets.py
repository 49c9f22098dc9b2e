"""State resets for SERVING: periodic model-state refresh on live streams.

Long audio degrades LSTM streaming models; the reference resets model state
every ``--sr_segment`` seconds with ``--sr_overlap`` seconds of warmup
context, at ~25% RTS cost on its FPGA (reference
docs/src/training/state_resets.md, performance.md:31-39 "with state
resets" rows; evaluate/state_resets/* implements the offline variant —
ours is evaluate/state_resets.py). This module brings the same mechanism
to the streaming server.

Design — shadow-lane handover, entirely host-side: the engine's lanes
advance in jitted lock-step, so a per-lane "replay the last 3 s" is
impossible without stalling the batch. Instead, for each user stream the
router keeps segment boundaries at ``k * segment`` on the stream's own
audio clock and:

  1. at ``boundary - overlap`` opens a SHADOW lane from zero model state,
     feeding it the same audio (its response clock is pre-set to the
     absolute frame via ``engine.set_lane_frame_base``);
  2. drops shadow responses that END inside the overlap (the offline
     analogue: overlap tokens of the second segment are dropped,
     evaluate/state_resets.py) and WITHHOLDS post-boundary ones — a
     backlogged shadow can outrun the primary's drain (burst pushes);
  3. once the primary has CONSUMED up to the boundary (``lane_frames``,
     or its EOS after a user hang-up — it only ever holds audio up to the
     boundary), retires it (EOS swallowed), promotes the shadow, and
     flushes the withheld responses — the stream continues seamlessly
     with stream-absolute timestamps. A user close with post-boundary
     audio in flight still completes the handover so no audio is lost.

Capacity: a stream occupies a second lane only during the overlap window,
so provision ``ceil(streams * (1 + overlap/segment))`` lanes — the same
lane arithmetic behind the reference's ~25% RTS cost. If no lane is free
when a shadow is due, that reset cycle is skipped (the stream simply keeps
its state one more segment) rather than dropping audio.

Works over a single StreamingEngine or a MultiChipEngine (any object with
open/close/push/tick/lane_frames/set_lane_frame_base).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class _SRStream:
    primary: int
    pos: int = 0                  # samples pushed by the user so far
    seg_k: int = 1                # next boundary is at seg_k * segment
    shadow: Optional[int] = None
    shadow_failed: bool = False   # no free lane this cycle; retry next one
    closed: bool = False
    retiring: List[int] = field(default_factory=list)  # lanes draining EOS
    # shadow responses past the boundary, withheld until the handover (a
    # bursty/backlogged shadow can outrun the primary's drain)
    buf: List[object] = field(default_factory=list)


class StateResetRouter:
    """Engine wrapper adding periodic state resets to live streams."""

    def __init__(self, engine, segment_secs: float = 15.0,
                 overlap_secs: float = 3.0):
        if not 0.0 < overlap_secs < segment_secs:
            raise ValueError("need 0 < overlap < segment")
        self.eng = engine
        fs = engine.frame_seconds if hasattr(engine, "frame_seconds") else \
            engine.engines[0].frame_seconds
        self.hop = int(round(
            (engine.hop_samples if hasattr(engine, "hop_samples")
             else engine.engines[0].hop_samples)))
        self.frame_secs = fs
        self.seg_ticks = max(2, int(round(segment_secs / fs)))
        self.ovl_ticks = max(1, min(int(round(overlap_secs / fs)),
                                    self.seg_ticks - 1))
        self.seg_samples = self.seg_ticks * self.hop
        self.ovl_samples = self.ovl_ticks * self.hop
        self.streams: Dict[int, _SRStream] = {}
        self._next_uid = 0
        self._warned_capacity = False

    # ------------------------------------------------------------ passthrough
    @property
    def B(self):
        return self.eng.B

    def warmup(self):
        self.eng.warmup()

    def close(self):
        if hasattr(self.eng, "close"):
            self.eng.close()

    # ---------------------------------------------------------------- streams
    def open_stream(self) -> Optional[int]:
        lane = self.eng.open_stream()
        if lane is None:
            return None
        uid = self._next_uid
        self._next_uid += 1
        self.streams[uid] = _SRStream(primary=lane)
        return uid

    def close_stream(self, uid: int):
        s = self.streams.get(uid)
        if s is None or s.closed:
            return
        s.closed = True
        self.eng.close_stream(s.primary)
        if s.shadow is not None:
            if s.pos >= s.seg_k * self.seg_samples:
                # the stream crossed the boundary: post-boundary audio lives
                # ONLY in the shadow, so the handover must still complete —
                # keep the shadow; tick() closes it after the swap.
                pass
            else:
                # ended mid-overlap: the primary heard everything; the
                # shadow is a pure re-decode of the tail — drop it
                self.eng.close_stream(s.shadow)
                s.retiring.append(s.shadow)
                s.shadow = None

    def push_audio(self, uid: int, samples: np.ndarray):
        s = self.streams[uid]
        n = len(samples)
        if n == 0 or s.closed:
            return
        start, end = s.pos, s.pos + n
        boundary = s.seg_k * self.seg_samples
        shadow_from = boundary - self.ovl_samples

        # the shadow must exist before any audio beyond the boundary
        # arrives; if no lane is free, skip this reset cycle cleanly
        if end > shadow_from and s.shadow is None and not s.shadow_failed:
            lane = self.eng.open_stream()
            if lane is None:
                if not self._warned_capacity:
                    warnings.warn(
                        "state-reset shadow lane unavailable (engine at "
                        "capacity); skipping this reset cycle — provision "
                        "~(1 + overlap/segment) lanes per stream"
                    )
                    self._warned_capacity = True
                s.shadow_failed = True
            else:
                s.shadow = lane
                self.eng.set_lane_frame_base(
                    lane, s.seg_k * self.seg_ticks - self.ovl_ticks
                )
        if s.shadow_failed and end > boundary:
            # reset cycle skipped: slide the grid one segment
            s.seg_k += 1
            s.shadow_failed = False
            boundary = s.seg_k * self.seg_samples

        # primary hears [start, min(end, boundary)); shadow hears
        # [max(start, shadow_from), end)
        p_end = min(end, boundary)
        if p_end > start:
            self.eng.push_audio(s.primary, samples[: p_end - start])
        if s.shadow is not None:
            sh_from = max(start, shadow_from)
            if end > sh_from:
                self.eng.push_audio(s.shadow, samples[sh_from - start:])
        s.pos = end

    # ------------------------------------------------------------------- tick
    def tick(self) -> Dict[int, object]:
        out = self.eng.tick()
        user_out: Dict[int, List[object]] = {}
        done = []
        for uid, s in self.streams.items():
            # drain retired lanes silently (their EOS frees the lane)
            s.retiring = [
                ln for ln in s.retiring if not _saw_eos(out.pop(ln, None))
            ]
            boundary_frames = s.seg_k * self.seg_ticks
            boundary_secs = boundary_frames * self.frame_secs
            resp = out.pop(s.primary, None)
            primary_eos = False
            if resp is not None:
                for m in _msgs(resp):
                    if _is_eos(m):
                        primary_eos = True
                    else:
                        user_out.setdefault(uid, []).append(m)
            if s.shadow is not None:
                # shadow responses: warmup re-decodes of the overlap are
                # dropped; anything ENDING past the boundary is the true
                # continuation — withheld until the handover so ordering
                # is preserved even when a backlogged shadow outruns the
                # primary's drain
                sresp = out.pop(s.shadow, None)
                if sresp is not None:
                    for m in _msgs(sresp):
                        if _is_eos(m):
                            continue
                        if _end_secs(m) > boundary_secs + 1e-9:
                            s.buf.append(m)
                # hand over once the primary has consumed through the
                # boundary (its EOS implies that: it only ever holds audio
                # up to the boundary)
                if primary_eos or (
                    self.eng.lane_frames(s.primary) >= boundary_frames
                ):
                    if not primary_eos:
                        self.eng.close_stream(s.primary)
                        s.retiring.append(s.primary)
                    # (on EOS the engine already released the lane)
                    s.primary = s.shadow
                    s.shadow = None
                    s.seg_k += 1
                    if s.buf:
                        user_out.setdefault(uid, []).extend(s.buf)
                        s.buf = []
                    if s.closed:
                        # user already hung up: flush the tail and finish
                        self.eng.close_stream(s.primary)
            elif primary_eos and s.closed:
                user_out.setdefault(uid, []).append({"eos": True})
                done.append(uid)
        for uid in done:
            self.streams[uid].primary = -1  # drained; only retirees remain
        for uid, s in list(self.streams.items()):
            if s.closed and s.primary == -1 and not s.retiring:
                del self.streams[uid]
        return {
            uid: (msgs if len(msgs) > 1 else msgs[0])
            for uid, msgs in user_out.items()
        }


def _msgs(resp) -> List[object]:
    return resp if isinstance(resp, list) else [resp]


def _is_eos(m) -> bool:
    return isinstance(m, dict) and bool(m.get("eos"))


def _end_secs(m) -> float:
    """Response end time: dict (Python path) or pre-serialized JSON string
    (native serializer). Parsing only happens for shadow-lane messages
    inside overlap windows — a tiny slice of total traffic."""
    if isinstance(m, str):
        import json

        m = json.loads(m)
    return float(m.get("end", 0.0))


def _saw_eos(resp) -> bool:
    if resp is None:
        return False
    msgs = resp if isinstance(resp, list) else [resp]
    return any(_is_eos(m) for m in msgs)
