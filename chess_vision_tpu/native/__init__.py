"""Native (C++) fast path: multithreaded JPEG decode + resize via ctypes.

The shared library is auto-built with make on first use (g++ + libjpeg, both
in the base image). The ctypes call releases the GIL, so a Python thread pool
achieves true decode parallelism — the native replacement for the reference's
dataloader worker processes (reference train.py:273-288).

PIL remains the default decode path for parity-sensitive evaluation (its
antialiased resize is the bit-parity target); the native path is the
throughput path for serving and training input.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libcvtdecoder.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_DIR, "decoder.cpp"))
        ):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "libcvtdecoder.so"],
                    check=True, capture_output=True,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_resize.restype = ctypes.c_int
            lib.decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.decode_ycbcr420.restype = ctypes.c_int
            lib.decode_ycbcr420.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            return None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_jpeg(data: bytes, out_size: int) -> np.ndarray | None:
    """JPEG bytes -> uint8 (out_size, out_size, 3), or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.decode_resize(
        data, len(data), out_size, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        return None
    return out


def decode_file(path: str, out_size: int) -> np.ndarray | None:
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_resize_jpeg(data, out_size)


def decode_ycbcr420(data: bytes, size: int):
    """4:2:0 JPEG bytes -> (Y (size,size), Cb, Cr (size/2,size/2)) uint8
    planes without chroma upsampling, or None if the JPEG doesn't match
    (wrong size/subsampling) — caller falls back to the RGB path."""
    lib = _load()
    if lib is None or size % 16:
        return None
    y = np.empty((size, size), np.uint8)
    cb = np.empty((size // 2, size // 2), np.uint8)
    cr = np.empty((size // 2, size // 2), np.uint8)
    rc = lib.decode_ycbcr420(
        data, len(data), size,
        y.ctypes.data_as(ctypes.c_void_p),
        cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return y, cb, cr


def decode_file_ycbcr420(path: str, size: int):
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_ycbcr420(data, size)
