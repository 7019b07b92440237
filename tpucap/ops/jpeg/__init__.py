"""ctypes binding for the C++ batched JPEG decoder, with build-on-demand
and a PIL fallback.

`decode_jpeg_batch(blobs, size)` -> (N, size, size, 3) uint8 RGB — the host
half of the config-5 input pipeline (SURVEY.md §2.3). The shared library is
compiled once from jpeg_decode.cpp into this package directory; if the
toolchain or libjpeg is unavailable the PIL path keeps everything working
(same nearest-resize convention, differentially tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "jpeg_decode.cpp")
_SO = os.path.join(_HERE, "_jpeg_decode.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> str:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
        "-ljpeg",
        "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.tpucap_decode_jpeg_batch.restype = ctypes.c_int
            lib.tpucap_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.tpucap_jpeg_dims.restype = ctypes.c_int
            lib.tpucap_jpeg_dims.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    blobs: list[bytes],
    size: int,
    *,
    n_threads: int = 0,
    force_fallback: bool = False,
    fast_scale: bool = True,
) -> np.ndarray:
    """Decode a list of JPEG byte strings -> (N, size, size, 3) uint8 RGB,
    nearest-resized (PIL convention)."""
    n = len(blobs)
    out = np.empty((n, size, size, 3), np.uint8)
    if n == 0:
        return out

    lib = None if force_fallback else _load()
    if lib is None:
        from io import BytesIO

        from PIL import Image

        for i, blob in enumerate(blobs):
            with Image.open(BytesIO(blob)) as img:
                img = img.convert("RGB")
                if img.size != (size, size):
                    img = img.resize((size, size), Image.Resampling.NEAREST)
                out[i] = np.asarray(img, np.uint8)
        return out

    data = np.frombuffer(b"".join(blobs), np.uint8)
    sizes = np.array([len(b) for b in blobs], np.int64)
    offsets = np.zeros(n, np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    status = np.zeros(n, np.int32)

    failures = lib.tpucap_decode_jpeg_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        size,
        size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(n_threads),
        int(fast_scale),
    )
    if failures:
        bad = np.nonzero(status)[0].tolist()
        raise ValueError(f"JPEG decode failed for images {bad}")
    return out


def decode_jpeg_files(paths, size: int, **kw) -> np.ndarray:
    blobs = []
    for p in paths:
        with open(p, "rb") as f:
            blobs.append(f.read())
    return decode_jpeg_batch(blobs, size, **kw)
