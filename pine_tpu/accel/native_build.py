"""ctypes binding for the native C++ SAH builder (pine_tpu/native).

Builds the shared library on first use if the toolchain is available; the
numpy builder in accel/bvh.py remains the fallback.  Output layout is
identical, so callers are agnostic.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpine_bvh.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pine_build_bvh.restype = ctypes.c_int32
    lib.pine_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def native_available():
    return _load() is not None


def build_sah_native(lo, hi):
    """-> (order (n,), c_lower (m,2,3), c_upper, c_node, c_start, c_count)
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = len(lo)
    order = np.empty(n, np.int32)
    c_lower = np.empty((n, 2, 3), np.float32)
    c_upper = np.empty((n, 2, 3), np.float32)
    c_node = np.empty((n, 2), np.int32)
    c_start = np.empty((n, 2), np.int32)
    c_count = np.empty((n, 2), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    m = lib.pine_build_bvh(
        lo.ctypes.data_as(fp),
        hi.ctypes.data_as(fp),
        n,
        order.ctypes.data_as(ip),
        c_lower.ctypes.data_as(fp),
        c_upper.ctypes.data_as(fp),
        c_node.ctypes.data_as(ip),
        c_start.ctypes.data_as(ip),
        c_count.ctypes.data_as(ip),
    )
    if m <= 0:
        return None
    return (
        order.astype(np.int64),
        c_lower[:m],
        c_upper[:m],
        c_node[:m],
        c_start[:m],
        c_count[:m],
    )
