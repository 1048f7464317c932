"""Native (C++) host-side IO fast path — lazy-built, ctypes-bound.

`lib()` compiles qcnn_gpu_tpu/native/yuvio.cpp to a shared object on first
use (cached by source mtime under native/build/) and returns the ctypes
handle, or None when no toolchain is available — callers fall back to the
NumPy implementations in data/yuv.py, which define the semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "yuvio.cpp")
_BUILD = os.path.join(_DIR, "build")
_SO = os.path.join(_BUILD, "libqcnnio.so")

_lib = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        os.makedirs(_BUILD, exist_ok=True)
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        h = ctypes.CDLL(_SO)
        h.read_y_planes.restype = ctypes.c_longlong
        h.read_y_planes.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
        ]
        h.write_y_as_420.restype = ctypes.c_int
        h.write_y_as_420.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        h.sse_u8.restype = ctypes.c_double
        h.sse_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong]
        h.psnr_u8.restype = ctypes.c_double
        h.psnr_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong]
        h.preprocess_u8.restype = None
        h.preprocess_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong]
        h.apply_residual_u8.restype = None
        h.apply_residual_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong
        ]
        _lib = h
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_y(path: str, height: int, width: int, frames: int, start: int = 0):
    """Native bulk Y-plane read -> uint8 [frames, H, W] or None."""
    h = lib()
    if h is None:
        return None
    out = np.empty((frames, height, width), dtype=np.uint8)
    got = h.read_y_planes(path.encode(), height, width, start, frames, _ptr(out))
    if got < 0:
        raise FileNotFoundError(path)
    if got < frames:
        raise EOFError(f"{path}: wanted {frames} frames, got {got} ({height}x{width})")
    return out


def write_y_as_420(path: str, y: np.ndarray) -> bool:
    h = lib()
    if h is None:
        return False
    y = np.ascontiguousarray(y, dtype=np.uint8)
    rc = h.write_y_as_420(path.encode(), _ptr(y), y.shape[0], y.shape[1], y.shape[2])
    if rc != 0:
        raise OSError(f"write failed: {path}")
    return True


def psnr(a: np.ndarray, b: np.ndarray):
    h = lib()
    if h is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    assert a.size == b.size
    return float(h.psnr_u8(_ptr(a), _ptr(b), a.size))
