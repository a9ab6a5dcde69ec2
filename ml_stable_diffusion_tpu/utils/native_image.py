"""ctypes binding for the native image converter (native/image).

Used by utils/image.py when the library is built; falls back to numpy.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "build" / "libsdtpu_image.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        from ..tokenizer.native import build_native

        build_native()
    if not _LIB_PATH.exists():
        raise OSError("native image library unavailable")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.sdtpu_denormalize_to_uint8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t]
    lib.sdtpu_uint8_to_float.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t, ctypes.c_float, ctypes.c_float]
    _lib = lib
    return lib


def denormalize_to_uint8_native(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.uint8)
    lib.sdtpu_denormalize_to_uint8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), x.size)
    return out


def uint8_to_float_native(x: np.ndarray, lo: float, hi: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.uint8)
    out = np.empty(x.shape, dtype=np.float32)
    lib.sdtpu_uint8_to_float(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size, lo, hi)
    return out
