"""ctypes bindings for the native C++ frame loader (native/loader.cpp).

Replaces the Python preloader thread of the reference's data layer
(src/entities/datasets.py:53-122) with a GIL-free worker pool that decodes
JPEG color + 16-bit PNG depth ahead of the consumer (SURVEY.md §2.4 P1).
Falls back gracefully (None) when the shared library is missing or the
dataset uses formats the native path doesn't cover (e.g. ScanNet's float
TIFF depths).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libloader.so"))
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:  # build on demand (toolchain is in the image)
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_dims.restype = ctypes.c_int
    lib.loader_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.loader_get.restype = ctypes.c_int
    lib.loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.restype = None
    _lib = lib
    return lib


def supported(color_paths: List[str], depth_paths: List[str]) -> bool:
    if not color_paths or not depth_paths:
        return False
    c = str(color_paths[0]).lower()
    d = str(depth_paths[0]).lower()
    return (
        c.endswith((".jpg", ".jpeg", ".png")) and d.endswith(".png")
    )


class NativeLoader:
    """Prefetching decoder over (color, depth) file lists."""

    def __init__(self, color_paths: List[str], depth_paths: List[str],
                 depth_scale: float, readahead: int = 8, n_threads: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        n = len(color_paths)
        c_arr = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in color_paths]
        )
        d_arr = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in depth_paths]
        )
        self._h = lib.loader_create(c_arr, d_arr, n, depth_scale, readahead,
                                    n_threads)
        if not self._h:
            raise RuntimeError("loader_create failed")
        w = ctypes.c_int()
        ht = ctypes.c_int()
        if lib.loader_dims(self._h, ctypes.byref(w), ctypes.byref(ht)) != 0:
            raise RuntimeError("loader_dims failed (unreadable frame 0)")
        self.width, self.height = w.value, ht.value
        self.n = n

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        depth = np.empty((self.height, self.width), np.float32)
        rc = self._lib.loader_get(
            self._h, idx,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"loader_get({idx}) failed rc={rc}")
        return rgb, depth

    def close(self):
        if getattr(self, "_h", None):
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def try_create(color_paths, depth_paths, depth_scale, readahead=8,
               n_threads=2) -> Optional[NativeLoader]:
    if not supported(color_paths, depth_paths):
        return None
    try:
        return NativeLoader([str(p) for p in color_paths],
                            [str(p) for p in depth_paths],
                            depth_scale, readahead, n_threads)
    except Exception:
        return None
