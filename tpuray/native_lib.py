"""ctypes bindings for the native C++ runtime components (tpuray/native).

The reference's host runtime is C (opencl_wrap.c, cpu_obj.c, cpu_ray.c);
the TPU compute path here is jax/XLA, but the IO-side runtime — PNG codec
and scene-archive codec — has native C++ equivalents built as a shared
library.  This module loads it if present and exposes a feature check so
pure-Python fallbacks keep everything working without the build step.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "native", "libtpuray.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tpuray_write_png.restype = ctypes.c_int
        lib.tpuray_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int]
        lib.tpuray_read_png_size.restype = ctypes.c_int
        lib.tpuray_read_png_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.tpuray_read_png.restype = ctypes.c_int
        lib.tpuray_read_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def write_png(path: str, img_u8: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img.shape[0], img.shape[1]
    rc = lib.tpuray_write_png(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h)
    if rc != 1:
        raise IOError(f"native png write failed for {path}")


def read_png(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.tpuray_read_png_size(path.encode(), ctypes.byref(w),
                                ctypes.byref(h)) != 1:
        raise IOError(f"native png open failed for {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.tpuray_read_png(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))) != 1:
        raise IOError(f"native png read failed for {path}")
    return out
