"""ctypes binding for the native preprocessing library (native/preprocess.cpp).

Builds the shared object on first use (``make -C native``) and falls back to
the pure-numpy path if the toolchain or build is unavailable. Used by the
DataModule's one-time dataset staging for non-trivial resizes.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpreprocess.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.center_crop_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.center_crop_resize_batch.restype = None
        _lib = lib
        logger.info("native preprocess library loaded (%s)", _LIB_PATH)
    except Exception as e:
        logger.warning("native preprocess unavailable (%s); using numpy path", e)
    return _lib


def is_available() -> bool:
    return _load() is not None


def center_crop_resize_batch(
    images: np.ndarray, size: int, num_threads: int = 0
) -> Optional[np.ndarray]:
    """[N,H,W,C] uint8 -> [N,size,size,C] uint8 (center-crop + area resize).

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    out = np.empty((n, size, size, c), dtype=np.uint8)
    lib.center_crop_resize_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, num_threads,
    )
    return out
