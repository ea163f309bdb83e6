"""Native (C++) host runtime: fast STL parsing and BMP IO.

Loaded via ctypes from a shared library compiled on first use (g++ is in
the image; pybind11 is not). Every entry point has a pure-python fallback
in raytpu.core, so the package works without a compiler — `available()`
reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "raytpu_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libraytpu_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.raytpu_parse_stl.restype = ctypes.c_int
        lib.raytpu_parse_stl.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.raytpu_write_bmp.restype = ctypes.c_int
        lib.raytpu_write_bmp.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.raytpu_read_bmp.restype = ctypes.c_int
        lib.raytpu_read_bmp.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_stl(path: str) -> np.ndarray:
    """ASCII STL -> (T, 3, 3) float32 vertices. Raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # First pass with a generous guess; re-run if the file is bigger.
    cap = 16384
    while True:
        buf = np.empty((cap, 9), np.float32)
        n = lib.raytpu_parse_stl(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
        )
        if n == -1:
            raise FileNotFoundError(path)
        if n == -2:
            raise ValueError(f"{path}: STL parse error")
        if n <= cap:
            if n == 0:
                raise ValueError(f"{path}: no facets found")
            return buf[:n].reshape(n, 3, 3).copy()
        cap = n


def write_bmp(path: str, rgb: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    rc = lib.raytpu_write_bmp(
        path.encode(), rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h,
    )
    if rc != 0:
        raise IOError(f"native BMP write failed ({rc}): {path}")


def read_bmp(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.raytpu_read_bmp(path.encode(), None, 0,
                             ctypes.byref(w), ctypes.byref(h))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"{path}: unsupported BMP")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.raytpu_read_bmp(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"native BMP read failed ({rc}): {path}")
    return out
