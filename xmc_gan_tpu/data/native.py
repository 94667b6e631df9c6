"""ctypes bindings for the native (C++/libjpeg) decode+augment library.

Builds ``native/decode.cpp`` lazily with g++ on first use (cached next to the
source); every call releases the GIL, so the DataLoader's worker threads
decode in parallel.  ``available()`` gates usage — environments without g++
or libjpeg fall back to the PIL path in ``data/pipeline.py`` transparently.
Disable explicitly with ``XMC_NATIVE_DECODE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libxmc_decode.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "decode.cpp"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, _SRC_PATH, "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("XMC_NATIVE_DECODE", "1") == "0":
            return None
        if not os.path.isfile(_SO_PATH) or (
            os.path.isfile(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.xmc_decode_train.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.xmc_decode_train.restype = ctypes.c_int
        lib.xmc_decode_test.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.xmc_decode_test.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


# DCT-scaled decode (libjpeg scale_denom) is on by default: it only engages
# when the source is >= 4x the resize target on the short side (the C side
# keeps >= 2x oversampling for the triangle filter), staying within a few
# uint8 LSBs of the exact path while skipping most IDCT work on large COCO
# photos.  XMC_DCT_SCALE=0 forces the exact full-resolution decode.
_FAST = os.environ.get("XMC_DCT_SCALE", "1") != "0"


def decode_train(
    jpeg_bytes: bytes, out_size: int, short_side: int,
    u_x: float, u_y: float, flip: bool, fast: bool | None = None,
) -> np.ndarray | None:
    """Decode + shorter-side resize + crop(u_x,u_y) + optional flip -> uint8
    HWC (normalized to [-1,1] on device; see ``ops.images.to_unit_range``).
    Returns None on decode failure (caller falls back)."""
    lib = _load()
    assert lib is not None
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.xmc_decode_train(
        _as_u8p(jpeg_bytes), len(jpeg_bytes), out_size, short_side,
        float(u_x), float(u_y), int(flip),
        int(_FAST if fast is None else fast),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def decode_test(
    jpeg_bytes: bytes, out_size: int, fast: bool | None = None
) -> np.ndarray | None:
    lib = _load()
    assert lib is not None
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.xmc_decode_test(
        _as_u8p(jpeg_bytes), len(jpeg_bytes), out_size,
        int(_FAST if fast is None else fast),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
