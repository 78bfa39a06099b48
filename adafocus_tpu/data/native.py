"""ctypes bindings for the native frame-loading core (native/frame_loader.cc).

Auto-builds ``libframeloader.so`` with the in-tree Makefile on first use
(g++ + libjpeg, both in the base image); every entry point degrades
gracefully to the PIL path when the library is unavailable, so the
framework never hard-depends on the native build.

The native core releases the GIL for the whole decode (ctypes foreign
calls drop it), so the Python-side thread pool in
``adafocus_tpu.data.pipeline`` scales across cores — and
``decode_batch`` goes further, fanning one call out over an internal C++
worker pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_NAME = "libframeloader.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    if os.path.exists(path):
        return path
    try:
        subprocess.run(
            ["make", "-s", _LIB_NAME], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
    except Exception:
        return None
    return path if os.path.exists(path) else None


def load_library() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.afl_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.afl_decode_file.restype = ctypes.c_int
        lib.afl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.afl_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_file(path: str, canvas: int) -> Optional[np.ndarray]:
    """Decode one JPEG to a (canvas, canvas, 3) uint8 array; None on error."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.afl_decode_file(
        path.encode(), canvas,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def decode_batch(
    paths: Sequence[str], canvas: int, n_threads: int = 8
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Decode many JPEGs into one (N, canvas, canvas, 3) buffer with the
    C++ worker pool. Returns (frames, status) — status[i] != 0 marks a
    failed file (caller applies its fallback policy); (None, None) if the
    native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None, None
    n = len(paths)
    out = np.empty((n, canvas, canvas, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.afl_decode_batch(
        arr, n, canvas,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status
