"""ctypes bridge to the native fastimage decoder (native/fastimage.cpp).

Auto-builds the shared library on first use (g++ is baked into the image);
falls back cleanly to the PIL path when the toolchain or libs are missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfastimage.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or (
                    _LIB_PATH.stat().st_mtime
                    < (_NATIVE_DIR / "fastimage.cpp").stat().st_mtime):
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.fastimage_load_batch.restype = ctypes.c_int
            lib.fastimage_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            print(f"[fastimage] native loader unavailable ({e}); "
                  "falling back to PIL")
            _lib_failed = True
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def load_batch(paths: Sequence[str], img_size: int, n_channels: int,
               mean: float, std: float,
               n_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode+resize+normalise a batch → (N, S, S, C) float32 NHWC, or None
    if the native library is unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, img_size, img_size, n_channels), np.float32)
    failed = np.full((n,), -1, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    threads = n_threads or min(os.cpu_count() or 1, 16)
    lib.fastimage_load_batch(
        arr, n, img_size, n_channels, ctypes.c_float(mean),
        ctypes.c_float(std),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    bad = failed[failed >= 0]
    if len(bad):
        raise IOError(f"fastimage failed to decode {len(bad)} images, e.g. "
                      f"{paths[int(bad[0])]}")
    return out
