"""ctypes bindings for the native C++ input-pipeline loader.

Builds ``loader.cc`` on demand with g++ (cached next to the source) and
exposes ``decode_resize_batch``. Falls back gracefully — callers should
check ``available()`` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _so_path() -> str:
    """Cache keyed on SOURCE CONTENT, not mtime: binaries are never
    committed (they are host-specific, built with -march=native), and a
    fresh checkout can give source and a stale artifact identical
    timestamps."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_native_loader_{digest}.so")


def _build(so: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", so, _SRC, "-ljpeg", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native loader build failed: %s", e)
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _so_path()
        if not os.path.exists(so):
            if not _build(so):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logger.warning("native loader load failed: %s", e)
            _build_failed = True
            return None
        lib.ld_decode_resize_batch.restype = ctypes.c_int
        lib.ld_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_batch(
    jpeg_buffers: list[bytes], out_size: int, n_threads: int = 4
) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode + resize a batch of JPEGs in C++ threads.

    Returns (images [N, 3, S, S] float32 in [0,1], orig_sizes [N, 2]
    (h, w) float32, n_failures). Failed decodes produce zero images with
    orig_sizes == (0, 0) so callers can invalidate those slots.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(jpeg_buffers)
    images = np.zeros((n, 3, out_size, out_size), np.float32)
    orig = np.ones((n, 2), np.float32)
    buf_array = (ctypes.c_char_p * n)(*jpeg_buffers)
    len_array = (ctypes.c_long * n)(*[len(b) for b in jpeg_buffers])
    failures = lib.ld_decode_resize_batch(
        ctypes.cast(buf_array, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(len_array, ctypes.POINTER(ctypes.c_long)),
        n,
        out_size,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return images, orig, failures
