"""ctypes bindings for the native frame I/O library (native/frameio.cpp).

Auto-builds the shared library with g++ on first use; every caller has a
pure-Python/cv2 fallback, so the framework stays functional without a
toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libframeio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            OSError) as e:
        logger.warning("native frameio build failed (%s); using fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            logger.exception("could not load %s", _LIB_PATH)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.frameio_read_exact.argtypes = [ctypes.c_int, u8p, ctypes.c_long]
        lib.frameio_read_exact.restype = ctypes.c_long
        lib.frameio_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.frameio_resize_bilinear_u8.restype = None
        lib.frameio_resize_batch_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int]
        lib.frameio_resize_batch_u8.restype = None
        lib.frameio_bgr_to_yuv420.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                              u8p]
        lib.frameio_bgr_to_yuv420.restype = None
        if hasattr(lib, "frameio_delta_encode"):
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.frameio_delta_encode.argtypes = [
                u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, u8p]
            lib.frameio_delta_encode.restype = ctypes.c_int
        if hasattr(lib, "frameio_bgr_to_yuv_tiles"):
            lib.frameio_bgr_to_yuv_tiles.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
            lib.frameio_bgr_to_yuv_tiles.restype = None
        if hasattr(lib, "frameio_delta_encode_rows"):
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.frameio_delta_encode_rows.argtypes = [
                u8p, u8p, ctypes.c_int, ctypes.c_long, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, i32p, u8p]
            lib.frameio_delta_encode_rows.restype = ctypes.c_int
        _lib = lib
        logger.info("native frameio loaded: %s", _LIB_PATH)
        return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return get_lib() is not None


def read_exact(fd: int, size: int) -> Optional[np.ndarray]:
    """Exact-size read from a file descriptor (GIL released). Returns the
    buffer or None on EOF/short read."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(size, np.uint8)
    n = lib.frameio_read_exact(fd, _ptr(buf), size)
    return buf if n == size else None


def resize_bilinear(frame: np.ndarray, out_hw, n_threads: int = 4
                    ) -> Optional[np.ndarray]:
    """(H, W, C) uint8 -> (h, w, C), half-pixel bilinear; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame)
    h, w = out_hw
    out = np.empty((h, w, frame.shape[2]), np.uint8)
    lib.frameio_resize_bilinear_u8(
        _ptr(frame), frame.shape[0], frame.shape[1], frame.shape[2],
        _ptr(out), h, w, n_threads)
    return out


def resize_batch(frames: np.ndarray, out_hw) -> Optional[np.ndarray]:
    """(N, H, W, 3) uint8 -> (N, h, w, 3), one thread per frame."""
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames)
    n, sh, sw, _ = frames.shape
    h, w = out_hw
    out = np.empty((n, h, w, 3), np.uint8)
    lib.frameio_resize_batch_u8(_ptr(frames), n, sh, sw, _ptr(out), h, w)
    return out


def bgr_to_yuv420(frame: np.ndarray) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 BGR -> (H*3//2, W) planar I420; H and W must be even."""
    lib = get_lib()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame)
    h, w, _ = frame.shape
    out = np.empty((h * 3 // 2, w), np.uint8)
    lib.frameio_bgr_to_yuv420(_ptr(frame), h, w, _ptr(out))
    return out


def delta_encode(frame: np.ndarray, ref: np.ndarray, tile: int,
                 threshold: int, refresh_start: int, refresh_count: int):
    """Tile-delta encode (GIL-free C++): returns (idx (K,) int32,
    tiles (K, tile, tile, 3) u8) and updates ref IN PLACE. None when the
    native library is unavailable (caller falls back to numpy).
    Bit-identical to runtime/delta.DeltaEncoder's numpy path."""
    lib = get_lib()
    if lib is None:
        return None
    if not (frame.flags["C_CONTIGUOUS"] and ref.flags["C_CONTIGUOUS"]):
        return None
    h, w, _ = frame.shape
    num_tiles = (h // tile) * (w // tile)
    if not hasattr(lib, "frameio_delta_encode"):
        return None  # stale prebuilt library without the symbol
    import ctypes as _ct
    idx = np.empty((num_tiles,), np.int32)
    tiles = np.empty((num_tiles, tile, tile, 3), np.uint8)
    k = lib.frameio_delta_encode(
        _ptr(frame), _ptr(ref), h, w, tile, int(threshold),
        int(refresh_start), int(refresh_count),
        idx.ctypes.data_as(_ct.POINTER(_ct.c_int32)), _ptr(tiles))
    return idx[:k].copy(), tiles[:k].copy()


def bgr_to_yuv_tiles(frame: np.ndarray, tile: int) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 BGR -> (num_tiles, tile*tile*3//2) tiled planar
    YUV420 records ([Y | U | V] per tile, row-major grid). None if no lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "frameio_bgr_to_yuv_tiles"):
        return None
    frame = np.ascontiguousarray(frame)
    h, w, _ = frame.shape
    num_tiles = (h // tile) * (w // tile)
    out = np.empty((num_tiles, tile * tile * 3 // 2), np.uint8)
    lib.frameio_bgr_to_yuv_tiles(_ptr(frame), h, w, tile, _ptr(out))
    return out


def delta_encode_rows(data: np.ndarray, ref: np.ndarray, threshold: int,
                      refresh_start: int, refresh_count: int):
    """Row-record delta encode (GIL-free C++): data/ref (N, S) u8 contiguous;
    returns (idx (K,) int32, rows (K, S) u8), updating ref IN PLACE. None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "frameio_delta_encode_rows"):
        return None
    if not (data.flags["C_CONTIGUOUS"] and ref.flags["C_CONTIGUOUS"]):
        return None
    import ctypes as _ct
    n, s = data.shape
    idx = np.empty((n,), np.int32)
    rows = np.empty((n, s), np.uint8)
    k = lib.frameio_delta_encode_rows(
        _ptr(data), _ptr(ref), n, s, int(threshold),
        int(refresh_start), int(refresh_count),
        idx.ctypes.data_as(_ct.POINTER(_ct.c_int32)), _ptr(rows))
    return idx[:k].copy(), rows[:k].copy()
