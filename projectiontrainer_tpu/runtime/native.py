"""ctypes bindings for the C++ host pipeline (runtime/csrc/pipeline.cpp).

Builds the shared library on first use with g++ -O3 -fopenmp (cached next to the
source; no pybind11 dependency). Every function has a numpy fallback so the framework
works without a C++ toolchain — the native path is a throughput optimization for the
input pipeline (SURVEY §7.3.6), not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO_PATH = os.path.join(_CSRC, "libptt_pipeline.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.join(_CSRC, "pipeline.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _SO_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(_SO_PATH)
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib = None
        if os.path.exists(_SO_PATH):
            src_mtime = os.path.getmtime(os.path.join(_CSRC, "pipeline.cpp"))
            if os.path.getmtime(_SO_PATH) >= src_mtime:
                try:
                    lib = ctypes.CDLL(_SO_PATH)
                except OSError:
                    lib = None
        if lib is None:
            lib = _build()
        if lib is None:
            _build_failed = True
            return None
        _declare(lib)
        _lib = lib
    return _lib


def _declare(lib: ctypes.CDLL):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.resize_bilinear_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2
    lib.flip_horizontal_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p]
    lib.shift_reflect_u8.argtypes = [u8p] + [ctypes.c_int] * 5 + [u8p]
    lib.contrast_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_float, u8p]
    lib.normalize_f32.argtypes = [u8p, ctypes.c_int] + [ctypes.c_float] * 3 + [f32p]
    lib.fused_preprocess.argtypes = (
        [u8p] + [ctypes.c_int] * 4 + [ctypes.c_float] * 4 + [ctypes.c_int]
        + [ctypes.c_float] * 3 + [f32p]
    )
    lib.elastic_warp_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [f32p, f32p, u8p]
    lib.fused_preprocess_elastic.argtypes = (
        [u8p] + [ctypes.c_int] * 4 + [ctypes.c_float] * 4 + [f32p, f32p]
        + [ctypes.c_int] + [ctypes.c_float] * 3 + [u8p, f32p]
    )
    lib.fused_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), i32p, i32p, ctypes.c_int, i32p, f32p, f32p,
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p,
    ]
    lib.ptt_num_threads.restype = ctypes.c_int


def native_available() -> bool:
    return _get_lib() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------------- ops


def resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    lib = _get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is None:
        import cv2

        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    out = np.empty((size, size, c), np.uint8)
    lib.resize_bilinear_u8(_u8p(img), h, w, c, _u8p(out), size, size)
    return out


def fused_preprocess(
    img: np.ndarray, size: int, *, flip: bool = False, zoom: float = 1.0,
    dx: float = 0.0, dy: float = 0.0, contrast: float = 1.0,
    rescale: float = 1.0 / 255.0, mean: float = 0.5, std: float = 0.5,
) -> np.ndarray:
    """One-pass augment+preprocess: uint8 HWC -> float32 [size, size, C] in [-1, 1]."""
    lib = _get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is None:
        return _fused_fallback(img, size, flip, zoom, dx, dy, contrast, rescale, mean, std)
    out = np.empty((size, size, c), np.float32)
    lib.fused_preprocess(
        _u8p(img), h, w, c, int(flip), float(zoom), float(dx), float(dy),
        float(contrast), size, rescale, mean, std, _f32p(out),
    )
    return out


def elastic_warp(img: np.ndarray, dispy: np.ndarray, dispx: np.ndarray) -> np.ndarray:
    """scipy ``map_coordinates(..., order=1, mode='reflect')`` elastic warp:
    out(y, x) = img(y + dispy[y,x], x + dispx[y,x]). Native when available."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    dispy = np.ascontiguousarray(dispy, np.float32)
    dispx = np.ascontiguousarray(dispx, np.float32)
    lib = _get_lib()
    if lib is None:
        from scipy.ndimage import map_coordinates

        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        iy, ix = (ys + dispy).reshape(-1), (xs + dispx).reshape(-1)
        out = np.zeros_like(img)
        for k in range(c):
            out[..., k] = map_coordinates(
                img[..., k], [iy, ix], order=1, mode="reflect"
            ).reshape(h, w)
        return out
    out = np.empty_like(img)
    lib.elastic_warp_u8(_u8p(img), h, w, c, _f32p(dispy), _f32p(dispx), _u8p(out))
    return out


def fused_preprocess_elastic(
    img: np.ndarray, size: int, dispy: np.ndarray, dispx: np.ndarray, *,
    flip: bool = False, zoom: float = 1.0, dx: float = 0.0, dy: float = 0.0,
    contrast: float = 1.0, rescale: float = 1.0 / 255.0, mean: float = 0.5,
    std: float = 0.5,
) -> np.ndarray:
    """Elastic variant of :func:`fused_preprocess`: affine+contrast at full res,
    elastic warp (scipy-reflect parity), bilinear resize + normalize — one native
    call. Returns float32 [size, size, C] in [-1, 1]."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    dispy = np.ascontiguousarray(dispy, np.float32)
    dispx = np.ascontiguousarray(dispx, np.float32)
    lib = _get_lib()
    if lib is None:
        # numpy composition: full-res affine (the fused mapping at identity resize
        # grid) -> elastic warp -> bilinear resize + normalize
        full = _affine_contrast_fullres(img, bool(flip), float(zoom), float(dx),
                                        float(dy), float(contrast))
        warped = elastic_warp(full, dispy, dispx)
        return _bilinear_resize_normalize(warped, size, rescale, mean, std)
    out = np.empty((size, size, c), np.float32)
    tmp = np.empty((h, w, c), np.uint8)
    lib.fused_preprocess_elastic(
        _u8p(img), h, w, c, int(flip), float(zoom), float(dx), float(dy),
        float(contrast), _f32p(dispy), _f32p(dispx), size, rescale, mean, std,
        _u8p(tmp), _f32p(out),
    )
    return out


def _affine_contrast_fullres(img, flip, zoom, dx, dy, contrast):
    """Full-res u8 affine+contrast — the fused mapping with an identity resize grid
    (numpy oracle for the native elastic path's pass 1)."""
    import cv2

    h, w, _ = img.shape
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    fy, fx = ys - dy, xs - dx
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy = (fy - cy) / zoom + cy
    gx = (fx - cx) / zoom + cx
    outside = (zoom < 1.0) & (
        (gy < -0.5) | (gy > h - 0.5) | (gx < -0.5) | (gx > w - 0.5)
    )
    gy = np.clip(gy, 0, h - 1)
    gx = np.clip(gx, 0, w - 1)
    if flip:
        gx = (w - 1) - gx
    sampled = cv2.remap(img, gx.astype(np.float32), gy.astype(np.float32),
                        cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)
    out = np.clip(np.round(sampled.astype(np.float32) * contrast), 0, 255)
    out[outside] = 0
    return out.astype(np.uint8)


def _bilinear_resize_normalize(img, size, rescale, mean, std):
    """Clamped bilinear resize to u8 then normalize (numpy oracle for the native
    elastic path's final pass)."""
    h, w, c = img.shape
    ys = np.clip((np.arange(size, dtype=np.float32) + 0.5) * (h / size) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(size, dtype=np.float32) + 0.5) * (w / size) - 0.5, 0, w - 1)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    ay, ax = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    f = img.astype(np.float32)
    top = f[y0][:, x0] + ax * (f[y0][:, x1] - f[y0][:, x0])
    bot = f[y1][:, x0] + ax * (f[y1][:, x1] - f[y1][:, x0])
    v = np.floor(np.clip(top + ay * (bot - top) + 0.5, 0, 255))
    return (v * rescale - mean) / std


def fused_preprocess_batch(
    imgs: list[np.ndarray], size: int, *, flips=None, zooms=None, dxs=None, dys=None,
    contrasts=None, rescale: float = 1.0 / 255.0, mean: float = 0.5, std: float = 0.5,
) -> np.ndarray:
    """OpenMP-parallel batch variant; per-image augmentation params."""
    n = len(imgs)
    flips = np.asarray(flips if flips is not None else np.zeros(n), np.int32)
    zooms = np.asarray(zooms if zooms is not None else np.ones(n), np.float32)
    dxs = np.asarray(dxs if dxs is not None else np.zeros(n), np.float32)
    dys = np.asarray(dys if dys is not None else np.zeros(n), np.float32)
    contrasts = np.asarray(contrasts if contrasts is not None else np.ones(n), np.float32)
    lib = _get_lib()
    if lib is None:
        return np.stack([
            _fused_fallback(np.ascontiguousarray(im, np.uint8), size, bool(f), float(z),
                            float(dx), float(dy), float(ct), rescale, mean, std)
            for im, f, z, dx, dy, ct in zip(imgs, flips, zooms, dxs, dys, contrasts)
        ])
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    c = imgs[0].shape[2]
    hs = np.asarray([im.shape[0] for im in imgs], np.int32)
    ws = np.asarray([im.shape[1] for im in imgs], np.int32)
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in imgs])
    out = np.empty((n, size, size, c), np.float32)
    i32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lib.fused_preprocess_batch(
        ptrs, i32(hs), i32(ws), c, i32(flips), _f32p(zooms), _f32p(dxs), _f32p(dys),
        _f32p(contrasts), n, size, rescale, mean, std, _f32p(out),
    )
    return out


def _fused_fallback(img, size, flip, zoom, dx, dy, contrast, rescale, mean, std):
    """numpy/cv2 replication of the fused path (also the parity oracle in tests)."""
    import cv2

    h, w, c = img.shape
    ys, xs = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    fy = (ys + 0.5) * (h / size) - 0.5 - dy
    fx = (xs + 0.5) * (w / size) - 0.5 - dx
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy = (fy - cy) / zoom + cy
    gx = (fx - cx) / zoom + cx
    outside = (zoom < 1.0) & (
        (gy < -0.5) | (gy > h - 0.5) | (gx < -0.5) | (gx > w - 0.5)
    )
    gy = np.clip(gy, 0, h - 1)
    gx = np.clip(gx, 0, w - 1)
    if flip:
        gx = (w - 1) - gx
    maps = (gx.astype(np.float32), gy.astype(np.float32))
    sampled = cv2.remap(img, maps[0], maps[1], cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT_101).astype(np.float32)
    sampled = np.clip(np.round(sampled * contrast), 0, 255)
    sampled[outside] = 0.0
    return (sampled * rescale - mean) / std
