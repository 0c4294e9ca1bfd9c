"""ctypes bindings for the native meshcore library (``native/meshcore.cpp``).

Builds on demand with the repo Makefile; ``locate`` raises if the library is
unavailable so callers (``core/triangulation.py``) can fall back to
matplotlib's trifinder or the NumPy search.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmeshcore.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    lib.meshcore_locate.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.meshcore_locate.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def locate(
    pos: np.ndarray, faces: np.ndarray, grid_x: np.ndarray, grid_y: np.ndarray,
    n_threads: int = 0,
) -> np.ndarray:
    """Per-pixel containing-triangle index (-1 outside)."""
    lib = _load()
    pos = np.ascontiguousarray(pos, np.float64)
    faces = np.ascontiguousarray(faces, np.int32)
    grid_x = np.ascontiguousarray(grid_x, np.float32)
    grid_y = np.ascontiguousarray(grid_y, np.float32)
    h, w = grid_x.shape
    out = np.empty((h, w), np.int32)
    lib.meshcore_locate(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pos),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        grid_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads,
    )
    return out
