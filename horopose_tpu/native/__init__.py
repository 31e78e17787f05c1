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
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", _SO]
    try:  # with libjpeg (decode path); fall back to crop-only without it
        subprocess.run(base + ["-ljpeg"], check=True, capture_output=True,
                       timeout=120)
        return True
    except Exception:
        pass
    try:
        subprocess.run(base + ["-DHOROPOSE_NO_JPEG"], check=True,
                       capture_output=True, timeout=120)
        print("[native] built without libjpeg (decode falls back to PIL)")
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
            if hasattr(lib, "jpeg_dims"):  # absent in the no-libjpeg build
                lib.jpeg_dims.argtypes = [
                    ctypes.c_void_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                lib.jpeg_dims.restype = ctypes.c_int
                lib.jpeg_decode_rgb.argtypes = [
                    ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_int]
                lib.jpeg_decode_rgb.restype = ctypes.c_int
            _lib = lib
        except Exception as e:
            print(f"[native] load failed ({e}); using Python fallback")
        return _lib


_decode_ok: Optional[bool] = None


def _verify_decode_parity(lib) -> bool:
    """One-time canary: the decode cache assumes 'decoding image i always
    yields the same bytes' regardless of which worker (native or
    PIL-fallback) filled the slot. PIL bundles its own libjpeg(-turbo);
    if the SYSTEM libjpeg this .so linked against ever disagrees (e.g.
    different fancy-upsampling), disable the native path on this host."""
    global _decode_ok
    if _decode_ok is not None:
        return _decode_ok
    try:
        import io
        from PIL import Image
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 255, (64, 80, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=92)
        data = buf.getvalue()
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raw = np.frombuffer(data, np.uint8)
        h, w = ctypes.c_int(0), ctypes.c_int(0)
        ours = None
        if not lib.jpeg_dims(raw.ctypes.data, len(data), ctypes.byref(h),
                             ctypes.byref(w)):
            ours = np.empty((h.value, w.value, 3), np.uint8)
            if lib.jpeg_decode_rgb(raw.ctypes.data, len(data),
                                   ours.ctypes.data, h.value, w.value):
                ours = None
        _decode_ok = ours is not None and ours.shape == ref.shape and \
            bool(np.array_equal(ours, ref))
        if not _decode_ok:
            print("[native] system libjpeg disagrees with PIL's; native "
                  "jpeg decode disabled on this host")
    except Exception:
        _decode_ok = False
    return _decode_ok


def decode_jpeg(path_or_bytes) -> Optional[np.ndarray]:
    """Decode a jpeg to RGB uint8 (H, W, 3) with the system libjpeg —
    byte-identical to PIL's Image.open(...).convert("RGB") (same library,
    same JDCT_ISLOW method; asserted in tests/test_native.py AND verified
    once per process against PIL by _verify_decode_parity). Returns None
    when the native library lacks the decode path, the canary check
    failed, or the file isn't a plain jpeg (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "jpeg_dims"):
        return None
    if not _verify_decode_parity(lib):
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        try:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        except OSError:
            return None
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(0), ctypes.c_int(0)
    if lib.jpeg_dims(buf.ctypes.data, len(data), ctypes.byref(h),
                     ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.jpeg_decode_rgb(buf.ctypes.data, len(data), out.ctypes.data,
                           h.value, w.value):
        return None
    return out


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
