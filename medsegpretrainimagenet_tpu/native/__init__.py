"""Native (C++/OpenMP) host-side kernels, bound via ctypes.

Built on first use with the system g++ (no pip deps); disable with
``MST_NATIVE=0``.  ``lib()`` returns the loaded library or ``None`` when
native is unavailable, so every caller has a pure-Python fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["lib", "available", "rotate_batch", "flip_batch",
           "u8_to_f32_scale"]

_SRC = os.path.join(os.path.dirname(__file__), "augment.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    cache = os.environ.get("MST_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "mst_native")
    os.makedirs(cache, exist_ok=True)
    return cache


def _build() -> Optional[str]:
    out = os.path.join(_build_dir(), "augment.so")
    if os.path.isfile(out) and os.path.getmtime(out) >= \
            os.path.getmtime(_SRC):
        return out
    # compile to a private temp path and rename into place: the cache is
    # shared between processes, and a concurrent CDLL() of a .so that g++
    # is still writing segfaults
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        # NOTE: _TRIED flips True only at each terminal outcome — AFTER
        # _LIB is assigned on success — never before the (up to 120 s)
        # build completes: an early flip would let concurrent callers on
        # the lock-free fast path above read (_TRIED=True, _LIB=None) and
        # permanently take the slow numpy fallback
        if os.environ.get("MST_NATIVE", "1") == "0":
            _TRIED = True
            return None
        path = _build()
        if path is None:
            _TRIED = True
            return None
        try:
            cdll = ctypes.CDLL(path)
        except OSError:
            _TRIED = True
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        cdll.rotate_bilinear_f32.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f32p, ctypes.c_float]
        cdll.rotate_nearest_i32.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f32p, ctypes.c_int32]
        cdll.flip_batch_4.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p, u8p]
        cdll.u8_to_f32_scale.argtypes = [u8p, f32p, ctypes.c_int64]
        _LIB = cdll
        _TRIED = True
        return _LIB


def available() -> bool:
    return lib() is not None


def _as_nhwc(arr: np.ndarray):
    if arr.ndim == 3:
        return arr[..., None], True
    return arr, False


def rotate_batch(images: np.ndarray, angles_deg: np.ndarray,
                 fill: float = 0.0, nearest: bool = False) -> np.ndarray:
    """Rotate a (N, H, W[, C]) batch by per-sample angles (degrees,
    counter-clockwise like cv2); constant border fill."""
    cdll = lib()
    assert cdll is not None, "native library unavailable"
    arr, squeeze = _as_nhwc(images)
    n, h, w, c = arr.shape
    angles = np.ascontiguousarray(angles_deg, np.float32)
    if nearest:
        # nearest only moves 4-byte values, so float inputs (distance
        # maps) route through the i32 kernel as raw bit patterns instead
        # of being truncated to integers
        in_dtype = arr.dtype
        if np.issubdtype(in_dtype, np.floating):
            a32 = np.ascontiguousarray(arr, np.float32).view(np.int32)
            fill_bits = np.float32(fill).view(np.int32)
            out = np.empty_like(a32)
            cdll.rotate_nearest_i32(a32, out, n, h, w, c, angles,
                                    fill_bits)
            out = out.view(np.float32).astype(in_dtype, copy=False)
        else:
            a32 = np.ascontiguousarray(arr, np.int32)
            out = np.empty_like(a32)
            cdll.rotate_nearest_i32(a32, out, n, h, w, c, angles,
                                    np.int32(fill))
            out = out.astype(in_dtype, copy=False)
    else:
        arr = np.ascontiguousarray(arr, np.float32)
        out = np.empty_like(arr)
        cdll.rotate_bilinear_f32(arr, out, n, h, w, c, angles,
                                 np.float32(fill))
    return out[..., 0] if squeeze else out


def flip_batch(images: np.ndarray, flip_v: np.ndarray,
               flip_h: np.ndarray) -> np.ndarray:
    """Per-sample vertical/horizontal flips of a 4-byte-dtype batch."""
    cdll = lib()
    assert cdll is not None, "native library unavailable"
    arr, squeeze = _as_nhwc(images)
    assert arr.dtype.itemsize == 4, "flip_batch needs a 4-byte dtype"
    arr = np.ascontiguousarray(arr)
    out = np.empty_like(arr)
    n, h, w, c = arr.shape
    cdll.flip_batch_4(arr.ctypes.data_as(ctypes.c_void_p),
                      out.ctypes.data_as(ctypes.c_void_p), n, h, w, c,
                      np.ascontiguousarray(flip_v, np.uint8),
                      np.ascontiguousarray(flip_h, np.uint8))
    return out[..., 0] if squeeze else out


def u8_to_f32_scale(arr: np.ndarray) -> np.ndarray:
    """uint8 -> float32 / 255 (threaded)."""
    cdll = lib()
    assert cdll is not None, "native library unavailable"
    arr = np.ascontiguousarray(arr, np.uint8)
    out = np.empty(arr.shape, np.float32)
    cdll.u8_to_f32_scale(arr, out.reshape(-1), arr.size)
    return out
