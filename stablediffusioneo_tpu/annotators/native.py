"""ctypes bindings for the native preprocessing library (native/preproc.cpp).

The native library covers the host hot path of the annotator layer (HWC3,
resize, Canny) — the role cv2 + the CUDA plugin stack play in the reference.
Loading mirrors the reference's plugin load
(`ctypes.CDLL('plugin/build/libplugin.so')`, onnx2trt_static_plugin.py:7-10);
every entry point has a cv2/numpy fallback so the framework works without
the compiled library.

Build: `make -C native` or `cmake -S native -B native/build && cmake --build
native/build`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libsdeo_preproc.so"),
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for cand in _LIB_CANDIDATES:
        path = os.path.abspath(cand)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.sdeo_hwc3.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, u8p]
            lib.sdeo_resize_bilinear.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int, ctypes.c_int,
            ]
            lib.sdeo_canny.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_double, ctypes.c_double, u8p]
            lib.sdeo_gaussian5.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
            lib.sdeo_rgb2gray.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
            _lib = lib
            break
    return _lib


def native_available() -> bool:
    return _load() is not None


def _u8(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def hwc3(x: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from stablediffusioneo_tpu.annotators.util import HWC3

        return HWC3(x)
    if x.ndim == 2:
        x = x[:, :, None]
    h, w, c = x.shape
    x = np.ascontiguousarray(x)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.sdeo_hwc3(_u8(x), h, w, c, _u8(out))
    assert rc == 0
    return out


def resize_bilinear(x: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        import cv2

        return cv2.resize(x, (dw, dh), interpolation=cv2.INTER_LINEAR)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    h, w, c = x.shape
    x = np.ascontiguousarray(x)
    out = np.empty((dh, dw, c), np.uint8)
    rc = lib.sdeo_resize_bilinear(_u8(x), h, w, c, _u8(out), dh, dw)
    assert rc == 0
    return out[:, :, 0] if squeeze else out


def rgb2gray(x: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        import cv2

        return cv2.cvtColor(x, cv2.COLOR_RGB2GRAY)
    h, w, _ = x.shape
    x = np.ascontiguousarray(x)
    out = np.empty((h, w), np.uint8)
    lib.sdeo_rgb2gray(_u8(x), h, w, _u8(out))
    return out


def canny(img: np.ndarray, low: float, high: float) -> np.ndarray:
    """Canny edges on uint8 gray or RGB (H,W[,3]) -> uint8 {0,255}."""
    lib = _load()
    if lib is None:
        import cv2

        return cv2.Canny(img, low, high)
    gray = rgb2gray(img) if img.ndim == 3 else img
    h, w = gray.shape
    gray = np.ascontiguousarray(gray)
    out = np.empty((h, w), np.uint8)
    rc = lib.sdeo_canny(_u8(gray), h, w, float(low), float(high), _u8(out))
    assert rc == 0
    return out
