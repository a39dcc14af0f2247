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


class NativePrefetcher:
    """C++ worker-pool prefetch queue (loader.cpp svo_prefetch_*).

    Decode happens entirely on native threads with C++ synchronization —
    no GIL involvement between submit and get.  Bounded in-flight window
    (queue_cap) mirrors the reference's frame-queue cap
    (depth_filter.cpp:82-97).  Use as a context manager."""

    def __init__(self, n_workers: int = 2, queue_cap: int = 8,
                 max_pixels: int = MAX_PIXELS):
        self._lib = _get_lib()
        if self._lib is None:
            raise RuntimeError("native loader unavailable")
        lib = self._lib
        if not hasattr(lib, "_prefetch_ready"):
            lib.svo_prefetch_start.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_long]
            lib.svo_prefetch_start.restype = ctypes.c_int
            lib.svo_prefetch_submit.argtypes = [
                ctypes.c_long, ctypes.c_char_p]
            lib.svo_prefetch_submit.restype = ctypes.c_int
            lib.svo_prefetch_get.argtypes = [
                ctypes.c_long,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.svo_prefetch_get.restype = ctypes.c_int
            lib.svo_prefetch_stop.argtypes = []
            lib.svo_prefetch_stop.restype = None
            lib._prefetch_ready = True
        self.max_pixels = max_pixels
        rc = lib.svo_prefetch_start(n_workers, queue_cap, max_pixels)
        if rc != 0:
            raise RuntimeError(f"svo_prefetch_start rc={rc}")

    def submit(self, job_id: int, path: str) -> bool:
        """Enqueue; False if the in-flight window is full (drain first)."""
        rc = self._lib.svo_prefetch_submit(job_id, path.encode())
        if rc == -1:
            return False
        if rc != 0:
            raise RuntimeError(f"svo_prefetch_submit rc={rc}")
        return True

    def get(self, job_id: int) -> np.ndarray:
        """Block until job_id is decoded; returns (H, W) float32."""
        buf = np.empty(self.max_pixels, dtype=np.float32)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        rc = self._lib.svo_prefetch_get(job_id, buf, ctypes.byref(w),
                                        ctypes.byref(h))
        if rc != 0:
            raise RuntimeError(f"decode failed rc={rc}")
        n = w.value * h.value
        return buf[:n].reshape(h.value, w.value).copy()

    def close(self):
        if self._lib is not None:
            self._lib.svo_prefetch_stop()
            self._lib = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
