"""Native host helpers: build-on-first-use C++ via g++ + ctypes.

No pybind11 in this image; the shim compiles ``fastply.cpp`` into a
shared object cached next to the source (or $READ_TPU_NATIVE_DIR) and
binds it with ctypes. Everything degrades gracefully: if no compiler is
available, callers fall back to the pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("READ_TPU_NATIVE_DIR", _HERE)
    os.makedirs(d, exist_ok=True)
    return d


def load() -> "ctypes.CDLL | None":
    """Build (if needed) and load the native library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "fastply.cpp")
        so = os.path.join(_build_dir(), "libfastply.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", "-o", so, src],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.parse_ascii_floats.restype = ctypes.c_int64
            lib.parse_ascii_floats.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.unpack_strided.restype = None
            lib.unpack_strided.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_char_p]
            lib.count_tokens.restype = ctypes.c_int64
            lib.count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def parse_ascii_floats(buf: bytes, n: int) -> "np.ndarray | None":
    """Parse n whitespace-separated floats from bytes; None if the native
    lib is unavailable or the buffer held fewer values."""
    lib = load()
    if lib is None:
        return None
    out = np.empty(n, np.float32)
    got = lib.parse_ascii_floats(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n)
    if got != n:
        return None
    return out


def unpack_strided(buf: bytes, offset: int, count: int, stride: int,
                   dtype: np.dtype) -> "np.ndarray | None":
    """Extract one interleaved binary property column into a contiguous
    array using the multithreaded native copier."""
    lib = load()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    out = np.empty(count, dtype)
    lib.unpack_strided(buf[offset:], count, stride, dtype.itemsize,
                       out.ctypes.data_as(ctypes.c_char_p))
    return out
