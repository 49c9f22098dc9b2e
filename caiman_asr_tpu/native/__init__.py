"""Native (C++) components, built on demand and loaded via ctypes.

The reference keeps its performance-critical host code native (CUDA/C++
kernels in training/lib/, DALI's C++ pipeline, the Rust levenshtein_rs dep);
this package is the TPU build's native layer:

- ``flac_decode`` — full FLAC decoder for the host data loader (no audio
  backend ships in the base image);
- ``levenshtein`` — token-sequence edit distance for WER;
- ``ResponseSerializer`` — the streaming server's per-tick host path
  (beam commit logic + detokenization + JSON) over the packed device
  outputs (serving/engine.py), ~25 us/lane in Python vs ~0.5 us/lane here.

First import compiles the ``src/*.cpp`` sources with g++ into a cached
shared library next to the sources; rebuilds automatically when any source
is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRCS = [
    Path(__file__).parent / "src" / "flac_decoder.cpp",
    Path(__file__).parent / "src" / "serialize.cpp",
    Path(__file__).parent / "src" / "staging.cpp",
]
_LIB = Path(__file__).parent / "src" / "libcaiman_native.so"
_lib: Optional[ctypes.CDLL] = None


class NativeBuildError(RuntimeError):
    pass


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or any(
        _LIB.stat().st_mtime < s.stat().st_mtime for s in _SRCS
    ):
        cmd = ["g++", "-O2", "-shared", "-fPIC",
               *[str(s) for s in _SRCS], "-o", str(_LIB)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeBuildError(f"building native library failed: {detail}")
    lib = ctypes.CDLL(str(_LIB))
    lib.flac_decode.restype = ctypes.c_int
    lib.flac_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
    ]
    lib.caiman_free.argtypes = [ctypes.c_void_p]
    lib.levenshtein_i64.restype = ctypes.c_int64
    lib.levenshtein_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    vp = ctypes.c_void_p
    lib.ser_init.restype = vp
    lib.ser_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_double, ctypes.c_int]
    lib.ser_free.argtypes = [vp]
    lib.ser_set_piece.argtypes = [vp, ctypes.c_int, ctypes.c_char_p,
                                  ctypes.c_int]
    lib.ser_reset_lane.argtypes = [vp, ctypes.c_int]
    lib.ser_greedy_tick.restype = ctypes.c_long
    lib.ser_greedy_tick.argtypes = [vp, i32p, ctypes.c_long, ctypes.c_int,
                                    u8p, ctypes.c_int, ctypes.c_char_p,
                                    ctypes.c_long, i32p, ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_long)]
    lib.ser_beam_tick.restype = ctypes.c_long
    lib.ser_beam_tick.argtypes = [vp, i32p, ctypes.c_long, u8p, ctypes.c_int,
                                  ctypes.c_char_p, ctypes.c_long,
                                  ctypes.POINTER(ctypes.c_int64), i32p,
                                  ctypes.c_long,
                                  ctypes.POINTER(ctypes.c_long)]
    lib.ser_set_frame_idx.argtypes = [vp, ctypes.c_int, ctypes.c_int64]
    lib.ser_lane_committed.restype = ctypes.c_int64
    lib.ser_lane_committed.argtypes = [vp, ctypes.c_int]
    lib.ser_lane_frame_idx.restype = ctypes.c_int64
    lib.ser_lane_frame_idx.argtypes = [vp, ctypes.c_int]
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.stg_init.restype = vp
    lib.stg_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.stg_free.argtypes = [vp]
    lib.stg_reset_lane.argtypes = [vp, ctypes.c_int]
    lib.stg_push.argtypes = [vp, ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.stg_push_i16.argtypes = [vp, ctypes.c_int, ctypes.c_void_p,
                                 ctypes.c_long]
    lib.stg_push_rows_i16.argtypes = [vp, ctypes.c_void_p, ctypes.c_long,
                                      ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_long]
    lib.stg_push_rows_f32.argtypes = [vp, ctypes.c_void_p, ctypes.c_long,
                                      ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_long]
    lib.stg_buffered.restype = ctypes.c_long
    lib.stg_buffered.argtypes = [vp, ctypes.c_int]
    lib.stg_tick.argtypes = [vp, i16p, ctypes.c_long, u8p, u8p, ctypes.c_int,
                             u8p, u8p]
    _lib = lib
    return lib


def flac_decode(data: bytes) -> Tuple[np.ndarray, int, int, bytes]:
    """Decode a FLAC byte stream.

    Returns (samples [n, channels] int32, sample_rate, bits_per_sample,
    streaminfo_md5). Raises ValueError on malformed input.
    """
    lib = _ensure_built()
    out = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    bps = ctypes.c_int()
    md5 = ctypes.create_string_buffer(16)
    rc = lib.flac_decode(
        data, len(data), ctypes.byref(out), ctypes.byref(n),
        ctypes.byref(ch), ctypes.byref(sr), ctypes.byref(bps), md5,
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc})")
    try:
        count = n.value * ch.value
        samples = np.ctypeslib.as_array(out, shape=(count,)).reshape(
            n.value, ch.value
        ).copy()
    finally:
        lib.caiman_free(out)
    return samples, sr.value, bps.value, bytes(md5.raw)


def flac_decode_file(path) -> Tuple[np.ndarray, int, int, bytes]:
    return flac_decode(Path(path).read_bytes())


def levenshtein(a, b) -> int:
    """Edit distance between two int sequences (native)."""
    lib = _ensure_built()
    aa = np.ascontiguousarray(a, dtype=np.int64)
    bb = np.ascontiguousarray(b, dtype=np.int64)
    return int(
        lib.levenshtein_i64(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(bb),
        )
    )


class ResponseSerializer:
    """Native streaming-response serializer (see src/serialize.cpp).

    Owns the per-lane beam commit state (committed horizon, token history,
    frame index) and emits wire-ready JSON response strings from the
    engine's packed per-tick outputs. Instance-handle based: any number of
    serializers coexist in one process (one per engine; the multi-chip
    server constructs one per device). The C state is freed on close() or
    garbage collection, whichever comes first.
    """

    def __init__(self, max_lanes: int, beam_width: int, beam_win: int,
                 frame_seconds: float, pieces):
        import weakref

        self._lib = _ensure_built()
        self._h = self._lib.ser_init(max_lanes, beam_width, beam_win,
                                     float(frame_seconds), len(pieces))
        if not self._h:
            raise ValueError(
                f"ser_init rejected (max_lanes={max_lanes}, beam_width="
                f"{beam_width}, beam_win={beam_win}, n_pieces={len(pieces)}):"
                " beam_width must be in [1, 64] and all sizes positive"
            )
        # finalizer owns the free; close() just runs it early (idempotent)
        self._finalize = weakref.finalize(
            self, self._lib.ser_free, self._h
        )
        for i, p in enumerate(pieces):
            b = p.encode("utf-8") if isinstance(p, str) else bytes(p)
            self._lib.ser_set_piece(self._h, i, b, len(b))
        self._buf = ctypes.create_string_buffer(4 << 20)
        self._dev_len = np.zeros(max_lanes, np.int64)
        # (lane, payload_off, payload_len) per record, filled by C; a lane
        # emits at most 3 records per tick (beam: slide-out final + commit
        # final + provisional), so this can never overflow
        self._idx = np.zeros((3 * max_lanes + 8, 3), np.int32)
        self._nrec = ctypes.c_long(0)

    def close(self):
        """Free the native serializer state (idempotent)."""
        self._finalize()
        self._h = None

    def _live(self):
        """Every C call goes through this: a None handle must raise here,
        not dereference NULL in C (a segfault would take the whole serving
        process down)."""
        if self._h is None:
            raise ValueError("ResponseSerializer used after close()")
        return self._h

    def reset_lane(self, lane: int):
        self._lib.ser_reset_lane(self._live(), lane)

    def committed(self, lane: int) -> int:
        return int(self._lib.ser_lane_committed(self._live(), lane))

    def frame_idx(self, lane: int) -> int:
        return int(self._lib.ser_lane_frame_idx(self._live(), lane))

    def set_frame_idx(self, lane: int, v: int):
        self._lib.ser_set_frame_idx(self._live(), lane, int(v))

    @staticmethod
    def _to_dict(raw: bytes, idx: np.ndarray):
        out = {}
        for lane, off, ln in idx.tolist():
            out.setdefault(lane, []).append(raw[off:off + ln].decode("utf-8"))
        return out

    def _grow(self):
        self._buf = ctypes.create_string_buffer(len(self._buf) * 2)

    def greedy_tick_raw(self, packed: np.ndarray, adv: np.ndarray):
        """packed: int32 [B, cap+1]; adv: bool [B].
        -> (raw bytes, idx int32 [n, 3] of (lane, payload_off, payload_len)).
        The raw/idx form skips the per-record Python header walk — slice
        ``raw[off:off+len]`` to get each JSON payload."""
        h = self._live()
        packed = np.ascontiguousarray(packed, np.int32)
        advu = np.ascontiguousarray(adv, np.uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        while True:
            n = self._lib.ser_greedy_tick(
                h,
                packed.ctypes.data_as(i32p),
                packed.shape[1], packed.shape[1] - 1,
                advu.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                packed.shape[0], self._buf, len(self._buf),
                self._idx.ctypes.data_as(i32p), self._idx.shape[0],
                ctypes.byref(self._nrec),
            )
            if n >= 0:
                # string_at copies only the used prefix (create_string_buffer
                # .raw would copy the whole multi-MB buffer every tick)
                return (ctypes.string_at(self._buf, n),
                        self._idx[: self._nrec.value])
            self._grow()

    def greedy_tick(self, packed: np.ndarray, adv: np.ndarray):
        """packed: int32 [B, cap+1]; adv: bool [B]. -> {lane: [json_str]}"""
        return self._to_dict(*self.greedy_tick_raw(packed, adv))

    def beam_tick_raw(self, packed: np.ndarray, adv: np.ndarray):
        """packed: int32 [B, W*win+W+2+W]; adv: bool [B].
        -> (raw bytes, idx int32 [n, 3], dev_len int64 [B])."""
        h = self._live()
        packed = np.ascontiguousarray(packed, np.int32)
        advu = np.ascontiguousarray(adv, np.uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        while True:
            n = self._lib.ser_beam_tick(
                h,
                packed.ctypes.data_as(i32p),
                packed.shape[1],
                advu.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                packed.shape[0], self._buf, len(self._buf),
                self._dev_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self._idx.ctypes.data_as(i32p), self._idx.shape[0],
                ctypes.byref(self._nrec),
            )
            if n >= 0:
                return (ctypes.string_at(self._buf, n),
                        self._idx[: self._nrec.value], self._dev_len)
            self._grow()

    def beam_tick(self, packed: np.ndarray, adv: np.ndarray):
        """packed: int32 [B, W*win+W+2+W]; adv: bool [B].
        -> ({lane: [json_str]}, dev_len int64 [B])."""
        raw, idx, dev_len = self.beam_tick_raw(packed, adv)
        return self._to_dict(raw, idx), dev_len


class AudioStaging:
    """Native per-lane audio buffering + staging-matrix fill (staging.cpp).

    Owns the lane ring buffers and carries; one ``tick`` call pops a hop of
    audio per ready lane into the [B, carry+hop] staging matrix and returns
    the advanced/finishing masks. Buffers hold int16 PCM (the WebSocket
    wire format) — float pushes are converted at the boundary; the
    int16->[-1,1] scale happens on device inside the jitted tick.
    Instance-handle based like ResponseSerializer: one per engine, any
    number per process.
    """

    def __init__(self, max_lanes: int, carry_len: int, hop: int):
        import weakref

        self._lib = _ensure_built()
        self._h = self._lib.stg_init(max_lanes, carry_len, hop)
        if not self._h:
            raise ValueError("stg_init failed")
        self._finalize = weakref.finalize(self, self._lib.stg_free, self._h)
        self._i16p = ctypes.POINTER(ctypes.c_int16)
        self._u8p = ctypes.POINTER(ctypes.c_uint8)
        self._adv = np.zeros(max_lanes, np.uint8)
        self._fin = np.zeros(max_lanes, np.uint8)

    def close(self):
        """Free the native staging state (idempotent)."""
        self._finalize()
        self._h = None

    def _live(self):
        # see ResponseSerializer._live: never hand C a NULL handle
        if self._h is None:
            raise ValueError("AudioStaging used after close()")
        return self._h

    def reset_lane(self, lane: int):
        self._lib.stg_reset_lane(self._live(), lane)

    def push(self, lane: int, samples: np.ndarray):
        x = samples
        # raw pointer via c_void_p: ~3x cheaper than a data_as POINTER cast
        # on the per-websocket-message hot path
        if isinstance(x, np.ndarray) and x.dtype == np.int16:
            if not x.flags.c_contiguous:
                x = np.ascontiguousarray(x)
            self._lib.stg_push_i16(self._live(), lane, x.ctypes.data, x.size)
            return
        if not (isinstance(x, np.ndarray) and x.dtype == np.float32
                and x.flags.c_contiguous):
            x = np.ascontiguousarray(x, np.float32)
        self._lib.stg_push(self._live(), lane, x.ctypes.data, x.size)

    def push_rows(self, block: np.ndarray, lanes=None):
        """Push row i of ``block`` ([m, n] int16 or float32) to lane
        ``lanes[i]`` (or lane i when lanes is None): one native call
        replaces m Python-level push() calls."""
        lanes_ptr = 0
        if lanes is not None:
            lanes = np.ascontiguousarray(lanes, np.int32)
            lanes_ptr = lanes.ctypes.data
        if block.dtype == np.int16:
            block = np.ascontiguousarray(block)
            self._lib.stg_push_rows_i16(
                self._live(), block.ctypes.data, block.shape[1], lanes_ptr,
                block.shape[0], block.shape[1],
            )
        else:
            block = np.ascontiguousarray(block, np.float32)
            self._lib.stg_push_rows_f32(
                self._live(), block.ctypes.data, block.shape[1], lanes_ptr,
                block.shape[0], block.shape[1],
            )

    def buffered(self, lane: int) -> int:
        return int(self._lib.stg_buffered(self._live(), lane))

    def tick(self, staging: np.ndarray, active: np.ndarray,
             closed: np.ndarray):
        """staging: int16 [B, carry+hop] (filled in place);
        active/closed: uint8 [B]. Returns (adv bool [B], finishing bool [B])."""
        self._lib.stg_tick(
            self._live(), staging.ctypes.data_as(self._i16p), staging.shape[1],
            np.ascontiguousarray(active, np.uint8).ctypes.data_as(self._u8p),
            np.ascontiguousarray(closed, np.uint8).ctypes.data_as(self._u8p),
            staging.shape[0],
            self._adv.ctypes.data_as(self._u8p),
            self._fin.ctypes.data_as(self._u8p),
        )
        return self._adv.astype(bool), self._fin.astype(bool)
