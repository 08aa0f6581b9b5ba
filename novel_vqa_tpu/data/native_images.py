"""ctypes bindings for the native image pipeline (native/imagepipe.cpp).

Build with ``make -C native`` (g++, libjpeg, libpng — all baked into the
image).  When ``native/libimagepipe.so`` is present, ``DecodePool`` in
data/images.py uses the threaded native batch decoder; otherwise it falls
back to PIL transparently.  Pixel-level outputs differ from PIL at the
decode-rounding level only (both are within the parity budget — features are
compared at the accuracy level, SURVEY.md section 7).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libimagepipe.so",
)

_lib = None
_load_failed = False


def _try_build() -> None:
    """Best-effort ``make -C native`` on first use (g++/libjpeg/libpng are in
    the base image; the .so is a build artifact, not checked in)."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            capture_output=True,
            timeout=120,
            check=False,
        )
    except Exception:
        pass


def get_lib():
    global _lib, _load_failed
    if _lib is None and not _load_failed:
        # build unconditionally: make is mtime-based (a fresh .so is a no-op)
        # and a STALE .so built from an older imagepipe.cpp would silently
        # lack newer entry points (e.g. imagepipe_decode_batch2, which
        # fast_decode needs — it would quietly degrade to the full-res path)
        _try_build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.imagepipe_decode_resize.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.imagepipe_decode_resize.restype = ctypes.c_int
            lib.imagepipe_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.imagepipe_decode_batch.restype = ctypes.c_int
            if hasattr(lib, "imagepipe_decode_batch2"):
                lib.imagepipe_decode_batch2.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.imagepipe_decode_batch2.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_native(
    path: str, size: int, center_crop_square: bool = False
) -> Tuple[np.ndarray, bool]:
    """Single-image native decode; mirrors data.images.decode_resize."""
    lib = get_lib()
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.imagepipe_decode_resize(
        path.encode(),
        size,
        int(center_crop_square),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return np.zeros((size, size, 3), np.uint8), True
    return out, False


def decode_batch_native(
    paths: List[str], size: int, center_crop_square: bool = False, n_threads: int = 8,
    fast_scale: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded native batch decode -> (uint8 (N,size,size,3), missing mask).

    ``fast_scale``: JPEGs decode DCT-downscaled (>= target short side) — up
    to ~4x cheaper IDCT for COCO-sized inputs; pixels deviate from the exact
    full-res path at the few-intensity-level scale, so the default is off.

    Decode *errors* are treated like missing files (the reference substitutes
    its mean-image for unreadable inputs, 001_prepro_img_vgg.lua:47-57)."""
    lib = get_lib()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if fast_scale and not hasattr(lib, "imagepipe_decode_batch2"):
        import warnings

        warnings.warn(
            "fast_scale requested but libimagepipe.so lacks "
            "imagepipe_decode_batch2 (stale build?); falling back to the "
            "full-resolution decode path — run `make -C native` to rebuild",
            RuntimeWarning,
            stacklevel=2,
        )
    if fast_scale and hasattr(lib, "imagepipe_decode_batch2"):
        lib.imagepipe_decode_batch2(
            arr,
            n,
            size,
            int(center_crop_square),
            1,
            n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        missing = status != 0
        out[missing] = 0
        return out, missing
    lib.imagepipe_decode_batch(
        arr,
        n,
        size,
        int(center_crop_square),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    missing = status != 0
    out[missing] = 0
    return out, missing
