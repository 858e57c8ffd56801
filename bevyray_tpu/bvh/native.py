"""ctypes binding to the native C++ PLOC builder (csrc/ploc.cpp).

The shared library is built on demand by ``ensure_built()`` (plain g++, no external
deps). If the toolchain or the .so is unavailable, ``build_ploc_native`` returns
``None`` and callers fall back to the NumPy implementation — same split as the
reference, whose BVH build is the one native-code hot loop (obvhs, extract.rs:316).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "ploc.cpp")
_SO = os.path.join(os.path.dirname(__file__), "csrc", "libploc.so")


def ensure_built() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native builder; None on any failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SRC):
                return None
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.ploc_build.restype = ctypes.c_int
            lib.ploc_build.argtypes = [
                ctypes.c_int,                     # n leaves
                ctypes.POINTER(ctypes.c_float),   # bmin [n,3]
                ctypes.POINTER(ctypes.c_float),   # bmax [n,3]
                ctypes.c_int,                     # search radius
                ctypes.POINTER(ctypes.c_float),   # out node_min [2n-1,3]
                ctypes.POINTER(ctypes.c_float),   # out node_max [2n-1,3]
                ctypes.POINTER(ctypes.c_int),     # out left
                ctypes.POINTER(ctypes.c_int),     # out right
                ctypes.POINTER(ctypes.c_int),     # out prim
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def build_ploc_native(bmin: np.ndarray, bmax: np.ndarray, search_radius: int):
    """Run the C++ PLOC build; returns the same tuple as ``build_ploc_np`` or None."""
    lib = ensure_built()
    if lib is None:
        return None
    n = bmin.shape[0]
    if n == 0:
        return None
    m = 2 * n - 1
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    node_min = np.zeros((m, 3), np.float32)
    node_max = np.zeros((m, 3), np.float32)
    left = np.zeros(m, np.int32)
    right = np.zeros(m, np.int32)
    prim = np.zeros(m, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    root = lib.ploc_build(
        n, bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp), search_radius,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        left.ctypes.data_as(ip), right.ctypes.data_as(ip),
        prim.ctypes.data_as(ip))
    if root < 0:
        return None
    return node_min, node_max, left, right, prim, int(root)
