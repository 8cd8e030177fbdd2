"""ctypes binding for the first-party C++ JPEG decoder (jpeg_decode.cpp).

Compiled lazily with the in-tree Makefile on first use (g++ + libjpeg are
part of the supported toolchain); all entry points release the GIL (ctypes
foreign calls), so Python thread pools get true decode parallelism, and
``decode_batch`` additionally fans out over C++ threads into one contiguous
(N, H, W, 3) buffer — the clip layout the input pipeline ships to device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtdeed_jpeg.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_DIR, check=True, capture_output=True
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.tdeed_jpeg_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tdeed_jpeg_probe.restype = ctypes.c_int
        lib.tdeed_jpeg_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tdeed_jpeg_decode.restype = ctypes.c_int
        lib.tdeed_jpeg_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tdeed_jpeg_decode_batch.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> tuple[int, int]:
    """(height, width) from the JPEG header."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.tdeed_jpeg_probe(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise FileNotFoundError(f"jpeg probe failed ({rc}): {path}")
    return h.value, w.value


def decode(path: str) -> np.ndarray:
    """Decode one JPEG to (H, W, 3) uint8 RGB."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    h, w = probe(path)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.tdeed_jpeg_decode(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), h, w
    )
    if rc != 0:
        raise OSError(f"jpeg decode failed ({rc}): {path}")
    return out


def decode_batch(
    paths: Sequence[Optional[str]],
    height: int,
    width: int,
    out: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode a clip's frames into one contiguous (N, H, W, 3) uint8 buffer.

    ``None`` entries and missing files come back as zero frames (the data
    layer's padding contract — ref: dataset/frame.py:376-382). Returns
    (buffer, n_decoded).
    """
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, 3), np.uint8)
    assert out.shape == (n, height, width, 3) and out.dtype == np.uint8
    # the C++ writer assumes a dense (N, H, W, 3) layout from the base
    # pointer — a strided view would scatter frames over unrelated memory
    assert out.flags["C_CONTIGUOUS"], "out must be C-contiguous"
    arr = (ctypes.c_char_p * n)(
        *[p.encode() if p is not None else None for p in paths]
    )
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    n_ok = lib.tdeed_jpeg_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.c_void_p), height, width, n_threads
    )
    return out, int(n_ok)
