"""ctypes binding + on-demand build for the native searchsorted library.

API parity with the reference's python shim
(d_nerf/torchsearchsorted/src/torchsearchsorted/searchsorted.py:20-53):
``searchsorted(a [ba, A] sorted, v [bv, V], side)`` with row broadcasting
when ``ba == 1`` or ``bv == 1``; returns int64 [max(ba, bv), V].
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_HERE = os.path.dirname(os.path.abspath(__file__))


def _build_lib() -> str:
    src = os.path.join(_HERE, "searchsorted.cpp")
    build_dir = os.path.join(_HERE, "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libswnerf_searchsorted.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", so]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def _get_lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            lib.swnerf_searchsorted.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ]
            lib.swnerf_searchsorted.restype = None
            _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _get_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def searchsorted(a: np.ndarray, v: np.ndarray, side: str = "left", n_threads: int = 0) -> np.ndarray:
    """Row-wise searchsorted with broadcasting (see module docstring)."""
    a = np.ascontiguousarray(a, dtype=np.float32)
    v = np.ascontiguousarray(v, dtype=np.float32)
    if a.ndim != 2 or v.ndim != 2:
        raise ValueError("a and v must be 2-D")
    ba, A = a.shape
    bv, V = v.shape
    if not (ba == bv or ba == 1 or bv == 1):
        raise ValueError(f"row mismatch: {ba} vs {bv} (one must be 1 or equal)")
    rows = max(ba, bv)
    out = np.empty((rows, V), dtype=np.int64)
    lib = _get_lib()
    lib.swnerf_searchsorted(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ba, A,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), bv, V,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if side == "right" else 0,
        n_threads,
    )
    return out
