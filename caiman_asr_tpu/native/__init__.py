"""Native (C++) components, built on demand and loaded via ctypes.

The reference keeps its performance-critical host code native (CUDA/C++
kernels in training/lib/, DALI's C++ pipeline, the Rust levenshtein_rs dep);
this package is the TPU build's native layer:

- ``flac_decode`` — full FLAC decoder for the host data loader (no audio
  backend ships in the base image);
- ``levenshtein`` — token-sequence edit distance for WER.

First import compiles ``src/flac_decoder.cpp`` with g++ into a cached
shared library next to the sources; rebuilds automatically when the source
is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "src" / "flac_decoder.cpp"
_LIB = Path(__file__).parent / "src" / "libcaiman_native.so"
_lib: Optional[ctypes.CDLL] = None


class NativeBuildError(RuntimeError):
    pass


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
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
