"""ctypes bridge to the native C++ data-loader core.

Mirrors the reference's ``custom_ops.get_plugin`` JIT-build-with-cache
pattern (lib/components/custom_ops.py:46-124): the extension compiles on
first use into a source-hash-stamped shared object; everything degrades to
numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "dataloader.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(tempfile.gettempdir(), "threedhumangan_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"dataloader_{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)

    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.normalize_masked_image.argtypes = [u8p, u8p, f32p, i64, i64, i64]
    lib.resize_nearest_u8.argtypes = [u8p, u8p, i64, i64, i64, i64, i64]
    lib.resize_bilinear_u8.argtypes = [u8p, u8p, i64, i64, i64, i64, i64]
    lib.shift_segment_labels.argtypes = [i64p, i64]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def normalize_masked_image(rgb: np.ndarray, mask: Optional[np.ndarray]) -> np.ndarray:
    """uint8 HWC (+mask HW) -> float32 HWC in [-1, 1], white background."""
    lib = get_lib()
    h, w, c = rgb.shape
    if lib is None:
        out = rgb.astype(np.float32) / 127.5 - 1.0
        if mask is not None:
            out[mask == 0] = 1.0
        return out
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((h, w, c), np.float32)
    mask_ptr = (
        _ptr(np.ascontiguousarray(mask, np.uint8), ctypes.c_uint8)
        if mask is not None else ctypes.POINTER(ctypes.c_uint8)()
    )
    lib.normalize_masked_image(
        _ptr(rgb, ctypes.c_uint8), mask_ptr, _ptr(out, ctypes.c_float), h, w, c)
    return out


def resize_u8(src: np.ndarray, dh: int, dw: int, nearest: bool = False) -> np.ndarray:
    """uint8 HWC (or HW) resize."""
    lib = get_lib()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    sh, sw, c = src.shape
    if lib is None:
        from PIL import Image

        img = Image.fromarray(src.squeeze() if squeeze else src)
        img = img.resize((dw, dh), Image.NEAREST if nearest else Image.BILINEAR)
        out = np.asarray(img)
        return out if not squeeze else out
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty((dh, dw, c), np.uint8)
    fn = lib.resize_nearest_u8 if nearest else lib.resize_bilinear_u8
    fn(_ptr(src, ctypes.c_uint8), _ptr(dst, ctypes.c_uint8), sh, sw, dh, dw, c)
    return dst[..., 0] if squeeze else dst


def shift_segment_labels(seg: np.ndarray) -> np.ndarray:
    """0 reserved for fake; fg += 1; bg -> 1 (ref datasets.py:305-309)."""
    lib = get_lib()
    seg = np.ascontiguousarray(seg, np.int64)
    if lib is None:
        out = seg.copy()
        fg = out > 0
        out[fg] += 1
        out[~fg] = 1
        return out
    lib.shift_segment_labels(_ptr(seg, ctypes.c_int64), seg.size)
    return seg
