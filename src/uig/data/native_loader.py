"""ctypes binding for the native C++ decode+resize loader (native/uig_loader.cpp).

The GIL is released for the whole batch decode (pure C ABI call), so the
input pipeline's producer thread never contends with the training loop's
Python work. Compiled on first use (g++, cached under native/build); all
callers fall back to the PIL path automatically if the toolchain or
libjpeg/libpng are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "..")
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libuig_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.uig_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.uig_decode_resize.restype = ctypes.c_int
        lib.uig_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.uig_decode_batch.restype = ctypes.c_int
        lib.uig_loader_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize(path: str, load_size: int) -> np.ndarray:
    """Decode one JPEG/PNG and resize to (load_size, load_size, 3) uint8."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((load_size, load_size, 3), np.uint8)
    rc = lib.uig_decode_resize(
        path.encode(), load_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_batch(paths: list[str], load_size: int,
                 n_threads: int = 8) -> np.ndarray:
    """Decode a batch in parallel into one (B, S, S, 3) uint8 array."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, load_size, load_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.uig_decode_batch(
        arr, n, load_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if rc != 0:
        raise IOError(f"native batch decode failed ({rc})")
    return out
