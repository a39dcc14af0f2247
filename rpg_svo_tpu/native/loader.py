"""ctypes wrapper around the native image loader (loader.cpp).

Builds the shared library on first use (make in this directory); falls
back to None so callers can use PIL when a toolchain isn't available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsvoloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _HERE], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.svo_load_gray.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_long,
            ]
            lib.svo_load_gray.restype = ctypes.c_int
            _lib = lib
        except OSError:
            return None
    return _lib


MAX_PIXELS = 4096 * 4096


def load_gray(path: str) -> Optional[np.ndarray]:
    """Decode to grayscale float32 [0,255]; None if native lib unavailable
    or the format is unsupported (caller falls back to PIL)."""
    lib = _get_lib()
    if lib is None:
        return None
    buf = np.empty(MAX_PIXELS, dtype=np.float32)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.svo_load_gray(path.encode(), buf, ctypes.byref(w),
                           ctypes.byref(h), MAX_PIXELS)
    if rc != 0:
        return None
    n = w.value * h.value
    return buf[:n].reshape(h.value, w.value).copy()
