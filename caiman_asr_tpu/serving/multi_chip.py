"""Multi-chip serving scale-out: one StreamingEngine per TPU chip.

The reference scales serving by adding FPGA cards behind one server —
"linear to 8 cards; 16,000 RTS/server measured" (reference
docs/src/key_features.md:50). The TPU-native equivalent: streaming lanes
are embarrassingly parallel (no cross-stream compute), so the scale-out
unit is one complete, independently-pinned StreamingEngine per
``jax.Device`` — there is deliberately NO mesh/collective here, because a
sharded tick would serialize every chip on the slowest lane batch and pay
ICI latency for zero algorithmic benefit. Each engine owns its chip's
params copy, streaming state, native staging/serializer instances, and
jitted tick; this router only

  - allocates lanes (least-loaded engine first, so chips stay balanced),
  - maps global stream ids <-> (engine, lane): gid = chip * per_chip + lane,
  - fans tick() out to all engines from a thread pool (ticks on distinct
    chips overlap: each engine dispatches to its own device and the host
    work of engine i runs while engine j's device computes),
  - merges the per-engine response dicts under global ids.

Capacity scales linearly with devices by construction (per-chip batch size
is unchanged); aggregate RTS = n_chips x single-chip RTS, as each chip
runs exactly the single-chip program. The WebSocket server drives this
through the same duck-typed engine interface (serving/server.py
--num_chips).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from caiman_asr_tpu.serving.engine import StreamingEngine


class _StreamsView:
    """Lazy merged view of the per-engine stream dicts under global ids."""

    __slots__ = ("_mc",)

    def __init__(self, mc: "MultiChipEngine"):
        self._mc = mc

    def __bool__(self):
        return any(e.streams for e in self._mc.engines)

    def __contains__(self, gid):
        chip, lane = divmod(int(gid), self._mc.per_chip)
        if not 0 <= chip < len(self._mc.engines):
            return False
        return lane in self._mc.engines[chip].streams

    def __len__(self):
        return sum(len(e.streams) for e in self._mc.engines)

    def __iter__(self):
        for i, e in enumerate(self._mc.engines):
            off = i * self._mc.per_chip
            for lane in e.streams:
                yield off + lane

    def __getitem__(self, gid):
        chip, lane = divmod(int(gid), self._mc.per_chip)
        return self._mc.engines[chip].streams[lane]

    def items(self):
        for i, e in enumerate(self._mc.engines):
            off = i * self._mc.per_chip
            for lane, st in e.streams.items():
                yield off + lane, st

    def keys(self):
        return iter(self)


class MultiChipEngine:
    """Drop-in StreamingEngine replacement spanning several devices.

    Exposes the subset of the engine interface the server and clients use
    (open_stream / close_stream / push_audio / push_audio_block / tick /
    warmup / streams / close) with lane ids globalized across chips.
    """

    def __init__(
        self,
        model,
        params,
        blank_idx: int,
        tokenizer,
        devices=None,
        max_streams_per_chip: int = 64,
        **engine_kw,
    ):
        import jax

        if devices is None:
            devices = jax.local_devices()
        devices = list(devices)
        if not devices:
            raise ValueError("MultiChipEngine needs at least one device")
        self.devices = devices
        self.per_chip = max_streams_per_chip
        self.engines: List[StreamingEngine] = [
            StreamingEngine(
                model, params, blank_idx, tokenizer,
                max_streams=max_streams_per_chip, device=d, **engine_kw,
            )
            for d in devices
        ]
        self._pool = (
            ThreadPoolExecutor(
                max_workers=len(devices), thread_name_prefix="chip-tick"
            )
            if len(devices) > 1
            else None
        )

    # ------------------------------------------------------------ properties
    @property
    def n_chips(self) -> int:
        return len(self.engines)

    @property
    def B(self) -> int:
        """Total lane capacity across chips."""
        return self.per_chip * len(self.engines)

    @property
    def streams(self) -> "_StreamsView":
        """Live streams keyed by GLOBAL id — a lazy read-only view.
        Truthiness and ``gid in streams`` delegate to the per-engine dicts
        without materializing a merge (the server checks both every tick
        interval); iterate/items() for the full mapping."""
        return _StreamsView(self)

    def _split(self, gid: int):
        chip, lane = divmod(gid, self.per_chip)
        return self.engines[chip], lane

    # ------------------------------------------------------------- lifecycle
    def warmup(self):
        """Compile every chip's tick program (concurrently: compilation is
        per-device and the cache is shared for identical programs)."""
        if self._pool is not None:
            list(self._pool.map(lambda e: e.warmup(), self.engines))
        else:
            self.engines[0].warmup()

    def close(self):
        for e in self.engines:
            e.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    # --------------------------------------------------------------- streams
    def open_stream(self) -> Optional[int]:
        """Allocate a lane on the least-loaded chip; returns a global id."""
        order = sorted(
            range(len(self.engines)),
            key=lambda i: len(self.engines[i].streams),
        )
        for i in order:
            lane = self.engines[i].open_stream()
            if lane is not None:
                return i * self.per_chip + lane
        return None

    def close_stream(self, gid: int):
        eng, lane = self._split(gid)
        eng.close_stream(lane)

    def push_audio(self, gid: int, samples: np.ndarray):
        eng, lane = self._split(gid)
        eng.push_audio(lane, samples)

    def lane_frames(self, gid: int) -> int:
        eng, lane = self._split(gid)
        return eng.lane_frames(lane)

    def set_lane_frame_base(self, gid: int, frames: int):
        eng, lane = self._split(gid)
        eng.set_lane_frame_base(lane, frames)

    def push_audio_block(self, block: np.ndarray, lanes=None):
        """Row i of ``block`` goes to global id ``lanes[i]`` (or global lane
        i when None). Rows are regrouped per chip so each engine still gets
        one batched native call."""
        m = block.shape[0]
        gids = np.arange(m) if lanes is None else np.asarray(lanes)
        chips = gids // self.per_chip
        for c in np.unique(chips):
            sel = np.flatnonzero(chips == c)
            self.engines[int(c)].push_audio_block(
                np.ascontiguousarray(block[sel]),
                (gids[sel] % self.per_chip).astype(np.int32),
            )

    # ------------------------------------------------------------------ tick
    def tick(self) -> Dict[int, object]:
        """Advance every chip (concurrently when >1) and merge responses
        under global stream ids."""
        if self._pool is not None:
            results = list(self._pool.map(lambda e: e.tick(), self.engines))
        else:
            results = [self.engines[0].tick()]
        from caiman_asr_tpu.serving.engine import WireTick

        if results and isinstance(results[0], WireTick):
            # wire mode: globalize the lane column of each chip's index
            # in place (idx is already a per-tick copy) and concatenate
            segments, specials = [], {}
            for i, r in enumerate(results):
                off = i * self.per_chip
                for raw, idx in r.segments:
                    if off:
                        idx[:, 0] += off
                    segments.append((raw, idx))
                for lane, msgs in r.specials.items():
                    specials[off + lane] = msgs
            return WireTick(segments, specials)
        out: Dict[int, object] = {}
        for i, r in enumerate(results):
            off = i * self.per_chip
            for lane, resp in r.items():
                out[off + lane] = resp
        return out

    def poll(self) -> Dict[int, object]:
        """Drain completed in-flight fetches on every chip without advancing
        lanes (engine.poll, globalized) — lets the server ship responses as
        each chip's device finishes rather than at the next tick."""
        results = [e.poll() for e in self.engines]
        from caiman_asr_tpu.serving.engine import WireTick

        if results and isinstance(results[0], WireTick):
            segments, specials = [], {}
            for i, r in enumerate(results):
                off = i * self.per_chip
                for raw, idx in r.segments:
                    if off:
                        idx[:, 0] += off
                    segments.append((raw, idx))
                for lane, msgs in r.specials.items():
                    specials[off + lane] = msgs
            return WireTick(segments, specials)
        out: Dict[int, object] = {}
        for i, r in enumerate(results):
            off = i * self.per_chip
            for lane, resp in r.items():
                out[off + lane] = resp
        return out
