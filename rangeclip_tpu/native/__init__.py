"""Native (C++) host-preprocessing bindings via ctypes.

``lib()`` returns the loaded shared object, compiling it on first use with
the system g++ (build.py).  All entry points degrade gracefully: when the
toolchain or .so is unavailable, callers fall back to the numpy
implementations in data/transforms.py (same math, slower).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "libpreprocess.so")


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO_PATH):
            try:
                from rangeclip_tpu.native.build import build

                build()
            except Exception:
                return None
        try:
            cdll = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        i64, f32p, i32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_int32))
        cdll.nearest_resize_f32.argtypes = [f32p, f32p, i64, i64, i64, i64, i64]
        cdll.nearest_resize_i32.argtypes = [i32p, i32p, i64, i64, i64, i64]
        cdll.lower_median_f32.argtypes = [f32p, i64]
        cdll.lower_median_f32.restype = ctypes.c_float
        cdll.median_normalize_f32.argtypes = [f32p, i64]
        cdll.depth_transform_f32.argtypes = [f32p, f32p, i64, i64, i64, i64]
        _LIB = cdll
        return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def depth_transform_native(depth: np.ndarray, size) -> Optional[np.ndarray]:
    """Fused nearest-resize + lower-median normalize; None if unavailable."""
    l = lib()
    if l is None:
        return None
    src = np.ascontiguousarray(depth, np.float32)
    h_out, w_out = size
    dst = np.empty((h_out, w_out), np.float32)
    l.depth_transform_f32(_fptr(src), _fptr(dst), src.shape[0], src.shape[1],
                          h_out, w_out)
    return dst


def segmentation_resize_native(seg: np.ndarray, size) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    src = np.ascontiguousarray(seg, np.int32)
    h_out, w_out = size
    dst = np.empty((h_out, w_out), np.int32)
    l.nearest_resize_i32(_iptr(src), _iptr(dst), src.shape[0], src.shape[1],
                         h_out, w_out)
    return dst
