"""ctypes bindings for the native runtime library (aosx_native.cpp).

Built with `python -m aosx.native.build` (or automatically on first import
when a compiler is available). Falls back gracefully: every caller checks
available()."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libaosx_native.so")
_lib = None


def build(verbose: bool = False) -> bool:
    src = os.path.join(_DIR, "aosx_native.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "aosx_native.cpp")
    ):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.aosx_load_pcd_xyz.restype = ctypes.c_long
    lib.aosx_load_pcd_xyz.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.aosx_thin.restype = ctypes.c_int
    lib.aosx_thin.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.aosx_label.restype = ctypes.c_int
    lib.aosx_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_pcd_xyz(path: str, max_points: int = 1 << 22) -> np.ndarray:
    lib = _load()
    out = np.empty((max_points, 3), np.float32)
    n = lib.aosx_load_pcd_xyz(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points
    )
    if n < 0:
        raise IOError(f"native PCD load failed: {path}")
    return out[:n].copy()


def thin(binary: np.ndarray, max_iters: int = 10000) -> np.ndarray:
    """Zhang-Suen to fixpoint; bit-identical to the Python oracle."""
    lib = _load()
    img = np.ascontiguousarray(binary.astype(np.uint8))
    h, w = img.shape
    lib.aosx_thin(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, max_iters)
    return img


def label(mask: np.ndarray):
    """8-connected components, raster discovery order. Returns (labels, n)."""
    lib = _load()
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((h, w), np.int32)
    n = lib.aosx_label(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h, w,
    )
    return out, n
