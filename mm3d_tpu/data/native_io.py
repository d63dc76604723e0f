"""ctypes bindings for the native C++ IO library (native/pointcloud_io.cpp).

Builds lazily with make on first use; callers fall back to numpy when the
toolchain or build is unavailable (never a hard dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmm3d_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR, "libmm3d_io.so"],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mm3d_parse_table.restype = ctypes.c_int64
            lib.mm3d_parse_table.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64]
            lib.mm3d_parse_many.restype = None
            lib.mm3d_parse_many.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def parse_table(path: str, cols: int,
                max_rows: int = 200_000) -> Optional[np.ndarray]:
    """Parse a float text table; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    while True:
        out = np.empty((max_rows, cols), np.float32)
        rows = lib.mm3d_parse_table(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_rows, cols)
        if rows < 0:
            raise FileNotFoundError(path)
        if rows < max_rows:
            return out[:rows].copy()
        # buffer exactly full = possible truncation (the native parser
        # stops at max_rows with no overflow signal, silently diverging
        # from the loadtxt fallback on >200k-row files — code-review
        # r5); retry with a doubled buffer.  An exact-fit file costs
        # one extra parse.
        max_rows *= 2


def parse_many(paths: List[str], cols: int, max_rows: int = 200_000,
               n_threads: int = 4) -> Optional[List[np.ndarray]]:
    """Parse many tables with the native thread pool."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, max_rows, cols), np.float32)
    rows = np.empty(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mm3d_parse_many(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_rows, cols, n_threads)
    bad = np.where(rows < 0)[0]
    if bad.size:  # -1 = open/read failure; never slice with it
        raise FileNotFoundError(paths[int(bad[0])])
    # rows == max_rows means the buffer filled: re-parse those files
    # with parse_table's growing buffer (truncation guard)
    return [parse_table(paths[i], cols, max_rows * 2)
            if rows[i] == max_rows else out[i, : rows[i]].copy()
            for i in range(n)]
