"""ctypes binding for the native C++ MAS kernel (csrc/mas.cc).

Compiled on first use with g++ (OpenMP batch parallelism). Host-side only —
the TPU path uses ops/mas.py (scan) or ops/mas_pallas.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so_path = os.path.join(_CSRC, "libmas.so")
        src = os.path.join(_CSRC, "mas.cc")
        if not os.path.exists(so_path) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(so_path)):
            cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                   "-o", so_path, src]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.maximum_path_batch.restype = None
        _lib = lib
        return lib


def maximum_path_native(neg_cent: np.ndarray, t_ys: np.ndarray,
                        t_xs: np.ndarray) -> np.ndarray:
    """Batch MAS on host. neg_cent [B, Ty, Tx] float32 -> path int32."""
    lib = _build_and_load()
    values = np.ascontiguousarray(neg_cent, np.float32).copy()
    b, t_y, t_x = values.shape
    paths = np.zeros((b, t_y, t_x), np.int32)
    t_ys = np.ascontiguousarray(t_ys, np.int32)
    t_xs = np.ascontiguousarray(t_xs, np.int32)
    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y, t_x)
    return paths
