"""Native (C++) host-side ops, loaded via ctypes.

Build is on-demand and cached next to the source; absence of a compiler
degrades gracefully to the PIL path in ``mm_utils``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_ops.cpp")
_LIB = os.path.join(_HERE, "libimage_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_image_ops() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.clip_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.clip_preprocess_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_image_ops() is not None


def clip_preprocess_batch_native(
    images: List[np.ndarray],  # list of uint8 [h, w, 3]
    out_size: int,
    background: Sequence[float],  # RGB 0..255
    mean: Sequence[float],
    std: Sequence[float],
) -> np.ndarray:
    """Fused pad-to-square + bicubic + normalize for a ragged image batch.
    Returns fp32 [n, out_size, out_size, 3] (NHWC)."""
    lib = load_image_ops()
    if lib is None:
        raise RuntimeError("native image ops unavailable (no g++?)")
    n = len(images)
    flat = np.concatenate([im.reshape(-1) for im in images]).astype(np.uint8)
    flat = np.ascontiguousarray(flat)
    offsets = np.zeros(n, np.int64)
    pos = 0
    heights = np.zeros(n, np.int32)
    widths = np.zeros(n, np.int32)
    for i, im in enumerate(images):
        assert im.ndim == 3 and im.shape[2] == 3 and im.dtype == np.uint8
        offsets[i] = pos
        heights[i] = im.shape[0]
        widths[i] = im.shape[1]
        pos += im.size
    out = np.empty((n, out_size, out_size, 3), np.float32)
    bg = np.asarray(background, np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    lib.clip_preprocess_batch(
        ptr(flat, ctypes.c_uint8),
        ptr(offsets, ctypes.c_int64),
        ptr(heights, ctypes.c_int),
        ptr(widths, ctypes.c_int),
        n, out_size,
        ptr(bg, ctypes.c_float), ptr(mean, ctypes.c_float),
        ptr(std, ctypes.c_float), ptr(out, ctypes.c_float),
    )
    return out
