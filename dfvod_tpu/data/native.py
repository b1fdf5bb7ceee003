"""ctypes bindings for the native C++ preprocessing library
(``native/preprocess.cpp``) — fused resize+normalize+pad and depth
min-max normalization. Builds the shared library on first use (g++ is in
the base image; pybind11 is not, hence ctypes). Falls back gracefully:
callers must check ``available()``.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdfvod_native.so")


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "preprocess.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception as e:
            print(f"[native] build failed, using python path: {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[native] load failed, using python path: {e}")
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, u8p, ctypes.c_int,
                                       ctypes.c_int]
    lib.preprocess_rgbd.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                    f32p, u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, f32p, f32p]
    lib.normalize_depth_u16.argtypes = [u16p, ctypes.c_int, u8p]
    lib.pack_rgbd_u8.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                 u8p, ctypes.c_int64]
    return lib


def available() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 (H, W, C) -> (dh, dw, C), half-pixel bilinear."""
    lib = _lib()
    src = np.ascontiguousarray(src)
    if src.ndim == 2:
        src = src[..., None]
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(_ptr(src, ctypes.c_uint8), sh, sw, c,
                           _ptr(dst, ctypes.c_uint8), dh, dw)
    return dst


def preprocess_rgbd(rgb: np.ndarray, depth: Optional[np.ndarray],
                    resized_hw: Tuple[int, int], pad_hw: Tuple[int, int],
                    mean: np.ndarray, std: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fused resize+normalize+pad. Returns (image (ph,pw,C) f32,
    mask (ph,pw) bool True=pad)."""
    lib = _lib()
    rgb = np.ascontiguousarray(rgb)
    sh, sw = rgb.shape[:2]
    rh, rw = resized_hw
    ph, pw = pad_hw
    C = 4 if depth is not None else 3
    out = np.empty((ph, pw, C), np.float32)
    mask = np.empty((ph, pw), np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    dptr = (_ptr(np.ascontiguousarray(depth), ctypes.c_uint8)
            if depth is not None else
            ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)))
    lib.preprocess_rgbd(_ptr(rgb, ctypes.c_uint8), dptr, sh, sw,
                        _ptr(out, ctypes.c_float),
                        _ptr(mask, ctypes.c_uint8),
                        ph, pw, rh, rw,
                        _ptr(mean, ctypes.c_float),
                        _ptr(std, ctypes.c_float))
    return out, mask.astype(bool)


def pack_rgbd_u8(rgb: np.ndarray, depth: np.ndarray,
                 out: np.ndarray) -> None:
    """Interleave (h, w, 3) RGB + (h, w) depth into the top-left of a
    C-contiguous (ph, pw, 4) uint8 canvas slice, in place."""
    lib = _lib()
    h, w = rgb.shape[:2]
    assert out.flags.c_contiguous and out.shape[-1] == 4
    lib.pack_rgbd_u8(_ptr(np.ascontiguousarray(rgb), ctypes.c_uint8),
                     _ptr(np.ascontiguousarray(depth), ctypes.c_uint8),
                     h, w, _ptr(out, ctypes.c_uint8),
                     out.shape[1] * 4)


def normalize_depth_u16(depth: np.ndarray) -> np.ndarray:
    """uint16/uint8 (H, W) -> min-max normalized uint8."""
    lib = _lib()
    d = np.ascontiguousarray(depth.astype(np.uint16))
    out = np.empty(d.shape, np.uint8)
    lib.normalize_depth_u16(_ptr(d, ctypes.c_uint16), d.size,
                            _ptr(out, ctypes.c_uint8))
    return out
