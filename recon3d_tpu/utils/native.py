"""ctypes bridge to the native frame-IO library (native/frameio.cc).

Lazily builds native/libframeio.so with the in-repo Makefile on first use
(cached; set RECON3D_NO_NATIVE=1 to force the pure-Python PIL fallbacks in
utils.io). All entry points return None/raise gracefully so callers can
fall back when the toolchain or an exotic PNG flavor isn't supported.
"""
from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _find_so() -> Optional[str]:
    """Locate libframeio: repo checkout (native/, built lazily by make) or
    an installed wheel (setup.py compiles it next to the package as
    recon3d_tpu/libframeio.*.so via the optional Extension)."""
    so = os.path.join(_native_dir(), "libframeio.so")
    if os.path.exists(so):
        return so
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(pkg_dir, "libframeio*.so")))
    if hits:
        return hits[0]
    if os.path.exists(os.path.join(_native_dir(), "Makefile")):
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
        if os.path.exists(so):
            return so
    return None


def load_library() -> Optional[ctypes.CDLL]:
    """Build/locate (once) and dlopen libframeio; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RECON3D_NO_NATIVE"):
        return None
    so = _find_so()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.frameio_png_info.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int)] * 4
    lib.frameio_png_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_long]
    lib.frameio_png_write_rgb8.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                           ctypes.c_int, ctypes.c_int]
    lib.frameio_png_write_gray8.argtypes = lib.frameio_png_write_rgb8.argtypes
    lib.frameio_png_write_gray16.argtypes = lib.frameio_png_write_rgb8.argtypes
    lib.frameio_load_rgbd_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def png_read(path: str) -> Optional[np.ndarray]:
    """Decode a PNG natively; None if the library or flavor is unsupported.

    Returns (H, W) or (H, W, C) uint8, or (H, W) uint16 for 16-bit gray.
    """
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.frameio_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(ch), ctypes.byref(bd)) != 0:
        return None
    dtype = np.uint16 if bd.value == 16 else np.uint8
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    out = np.empty(shape, dtype)
    rc = lib.frameio_png_read(path.encode(),
                              out.ctypes.data_as(ctypes.c_void_p),
                              out.nbytes)
    return out if rc == 0 else None


def png_write(path: str, img: np.ndarray) -> bool:
    """Encode uint8 gray/RGB or uint16 gray natively; False on fallback."""
    lib = load_library()
    if lib is None:
        return False
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    p = img.ctypes.data_as(ctypes.c_void_p)
    if img.dtype == np.uint16 and img.ndim == 2:
        return lib.frameio_png_write_gray16(path.encode(), p, w, h) == 0
    if img.dtype == np.uint8 and img.ndim == 2:
        return lib.frameio_png_write_gray8(path.encode(), p, w, h) == 0
    if img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3:
        return lib.frameio_png_write_rgb8(path.encode(), p, w, h) == 0
    return False


def load_rgbd_batch(color_paths: List[str], depth_paths: List[str],
                    width: int, height: int, threads: int = 0
                    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Thread-pool decode of n (color RGB8, depth GRAY16) PNG pairs.

    Returns (colors (n,H,W,3) u8, depths (n,H,W) u16) or None on any
    unsupported file (caller falls back to per-file PIL)."""
    lib = load_library()
    if lib is None or not color_paths:
        return None
    n = len(color_paths)
    assert len(depth_paths) == n
    if threads <= 0:
        threads = min(max(os.cpu_count() or 1, 1), 16)
    colors = np.empty((n, height, width, 3), np.uint8)
    depths = np.empty((n, height, width), np.uint16)
    status = (ctypes.c_int * n)()
    cp = (ctypes.c_char_p * n)(*[p.encode() for p in color_paths])
    dp = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
    rc = lib.frameio_load_rgbd_batch(
        cp, dp, n, width, height,
        colors.ctypes.data_as(ctypes.c_void_p),
        depths.ctypes.data_as(ctypes.c_void_p), status, threads)
    return (colors, depths) if rc == 0 else None
