"""ctypes bindings for the native C++ loader kernels (native/loader.cc).

The library is compiled on first use with g++ (cached next to the source);
every binding has a numpy fallback so the framework degrades gracefully on
hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

# the source ships as package data (pyproject [tool.setuptools.package-data])
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "native", "loader.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _so_path() -> Optional[str]:
    """Build target: next to the source when writable (editable install /
    repo checkout), else a per-user cache dir (site-packages installs are
    often read-only).  None when neither is writable (e.g. read-only
    container with an unwritable HOME) — get_lib() then degrades to the
    numpy fallbacks instead of raising out of its documented contract."""
    pkg_dir = os.path.dirname(_SRC)
    if os.access(pkg_dir, os.W_OK):
        return os.path.join(pkg_dir, "libbsrloader.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "blindshadowremoval_tpu")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return None
    return os.path.join(cache, "libbsrloader.so")


def _build(so: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", so, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable —
    every binding in this module has a numpy fallback, so a host without a
    toolchain degrades gracefully instead of failing at install time."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _so_path()
        if so is None:
            return None
        if not os.path.isfile(so) or (
                os.path.isfile(_SRC)
                and os.path.getmtime(so) < os.path.getmtime(_SRC)):
            if not os.path.isfile(_SRC) or not _build(so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.crop_resize_bilinear.argtypes = [fp, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, ip, fp, ctypes.c_int]
        lib.hflip.argtypes = [fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp]
        lib.batch_crop_resize.argtypes = [fp, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int, ip, fp,
                                          ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def crop_resize(img: np.ndarray, box, size: int) -> np.ndarray:
    """Zero-padded crop of `box` (x0, y0, x1, y1) + bilinear resize to
    (size, size).  Native when available, numpy fallback otherwise."""
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    lib = get_lib()
    out = np.empty((size, size, c), np.float32)
    if lib is not None:
        boxa = np.ascontiguousarray(np.asarray(box, np.int32))
        lib.crop_resize_bilinear(_fp(img), h, w, c, _ip(boxa), _fp(out), size)
        return out
    return _crop_resize_np(img, box, size)


def _crop_resize_np(img: np.ndarray, box, size: int) -> np.ndarray:
    x0, y0, x1, y1 = [int(v) for v in box]
    h, w, c = img.shape
    ys = y0 + (np.arange(size) + 0.5) * (y1 - y0) / size - 0.5
    xs = x0 + (np.arange(size) + 0.5) * (x1 - x0) / size - 0.5
    yy0 = np.floor(ys).astype(np.int64)
    xx0 = np.floor(xs).astype(np.int64)
    fy = (ys - yy0)[:, None, None]
    fx = (xs - xx0)[None, :, None]

    def take(yi, xi):
        valid = ((yi[:, None] >= 0) & (yi[:, None] < h)
                 & (xi[None, :] >= 0) & (xi[None, :] < w))
        ycl = np.clip(yi, 0, h - 1)
        xcl = np.clip(xi, 0, w - 1)
        vals = img[ycl[:, None], xcl[None, :], :]
        return vals * valid[..., None]

    v00 = take(yy0, xx0)
    v01 = take(yy0, xx0 + 1)
    v10 = take(yy0 + 1, xx0)
    v11 = take(yy0 + 1, xx0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def batch_crop_resize(imgs: np.ndarray, boxes: np.ndarray, size: int,
                      n_threads: int = 0) -> np.ndarray:
    """Batched native crop+resize over [N,H,W,C] with [N,4] boxes."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w, c = imgs.shape
    lib = get_lib()
    if lib is None:
        return np.stack([_crop_resize_np(imgs[i], boxes[i], size)
                         for i in range(n)])
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, n)
    boxes = np.ascontiguousarray(np.asarray(boxes, np.int32))
    out = np.empty((n, size, size, c), np.float32)
    lib.batch_crop_resize(_fp(imgs), n, h, w, c, _ip(boxes), _fp(out), size,
                          n_threads)
    return out


def hflip(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(img[:, ::-1])
    h, w, c = img.shape
    out = np.empty_like(img)
    lib.hflip(_fp(img), h, w, c, _fp(out))
    return out
