"""ctypes bindings for the C++ rotated-geometry host kernels.

Builds ``rotated_geometry.cpp`` on first use (g++ -O3, cached next to the
source) and exposes :func:`pairwise_rotated_iou_native` /
:func:`nms_rotated_native` with the same contracts as the XLA kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rotated_geometry.cpp")
_SO = os.path.join(_DIR, "librotated_geometry.so")
_lock = threading.Lock()
_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.pairwise_rotated_iou.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pairwise_rotated_iou.restype = None
        lib.nms_rotated.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nms_rotated.restype = ctypes.c_int64
        lib.match_rotated.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.match_rotated.restype = None
        _lib = lib
        return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pairwise_rotated_iou_native(boxes1, boxes2) -> np.ndarray:
    """N×M exact skew-IoU matrix, double-precision host kernel."""
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    n, m = len(b1), len(b2)
    out = np.zeros((n, m), np.float32)
    if n and m:
        get_lib().pairwise_rotated_iou(_fptr(b1), n, _fptr(b2), m, _fptr(out))
    return out


def nms_rotated_native(boxes, scores, iou_threshold: float) -> np.ndarray:
    """Greedy rotated NMS; kept input indices by descending score."""
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    n = len(b)
    keep = np.zeros((n,), np.int64)
    if n == 0:
        return keep
    cnt = get_lib().nms_rotated(
        _fptr(b), _fptr(s), n, ctypes.c_float(iou_threshold),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return keep[:cnt]


def match_rotated_native(pred_geom, pred_cls, tar_geom, tar_cls,
                         iouv) -> np.ndarray:
    """Per-image eval matching (reference ``test.py:121-145`` protocol).

    ``pred_geom``/``tar_geom``: degree boxes; predictions in confidence
    order.  Returns the ``(n, len(iouv))`` bool TP matrix, bit-identical
    to the Python matcher in :mod:`ryolo_tpu.eval.metrics` (same C++ IoU
    core, f32-rounded values, first-max argmax, first-claim-per-target).
    """
    pg = np.ascontiguousarray(pred_geom, np.float32)
    pc = np.ascontiguousarray(pred_cls, np.float32)
    tg = np.ascontiguousarray(tar_geom, np.float32)
    tc = np.ascontiguousarray(tar_cls, np.float32)
    iv = np.ascontiguousarray(iouv, np.float64)
    n, m, k = len(pg), len(tg), len(iv)
    tp = np.zeros((n, k), np.uint8)
    if n:
        get_lib().match_rotated(
            _fptr(pg), _fptr(pc), n, _fptr(tg), _fptr(tc), m,
            iv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            tp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return tp.astype(bool)
