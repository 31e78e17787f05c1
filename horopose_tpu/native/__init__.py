"""Native (C++) data-path kernels, loaded via ctypes.

Compiled on first import with g++ (-O3 -march=native) into the package
directory; every consumer falls back to the pure-Python path when the
toolchain or the .so is unavailable, so the framework never hard-depends on
a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dream_ops.cpp")
_SO = os.path.join(_DIR, "libdream_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"[native] build failed ({e}); using Python fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if os.environ.get("HOROPOSE_DISABLE_NATIVE"):
        return None  # benchmarking / debugging knob: force the PIL fallback
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.crop_resize_bilinear.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int]
            lib.crop_resize_bilinear_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            _lib = lib
        except Exception as e:
            print(f"[native] load failed ({e}); using Python fallback")
        return _lib


def crop_resize_bilinear(src: np.ndarray, bbox, size: int
                         ) -> Optional[np.ndarray]:
    """Fused square-pad crop + bilinear resize. Returns None when the native
    library is unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    assert src.ndim == 3 and src.shape[2] == 3
    out = np.empty((size, size, 3), np.uint8)
    wmin, hmin, wmax, hmax = [int(v) for v in bbox]
    lib.crop_resize_bilinear(
        src.ctypes.data, src.shape[0], src.shape[1],
        wmin, hmin, wmax, hmax, out.ctypes.data, size)
    return out
