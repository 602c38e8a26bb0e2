"""Native (C++) input-pipeline kernels with ctypes bindings.

Lazy-built with g++ on first use (`make -C distillbev_tpu/native` to
prebuild); every entry point has a numpy fallback so the framework works
without a toolchain.  See src/pipeline.cc for the design rationale.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_DIR = osp.dirname(osp.abspath(__file__))
_SO = osp.join(_DIR, "libdbev_pipeline.so")


def _build() -> Optional[str]:
    src = osp.join(_DIR, "src", "pipeline.cc")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _SO, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        src = osp.join(_DIR, "src", "pipeline.cc")
        stale = (osp.exists(_SO) and osp.exists(src) and
                 os.path.getmtime(src) > os.path.getmtime(_SO))
        path = _SO if osp.exists(_SO) and not stale else _build()
        if path is None:
            _LIB = False
            return None
        lib = ctypes.CDLL(path)
        lib.aggregate_sweeps.restype = ctypes.c_int64
        lib.aggregate_sweeps.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64]
        lib.normalize_images.restype = None
        lib.normalize_images.argtypes = [
            np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32), ctypes.c_float]
        lib.range_filter_pad.restype = ctypes.c_int64
        lib.range_filter_pad.argtypes = [
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64]
        lib.points_to_depth_maps.restype = None
        lib.points_to_depth_maps.argtypes = [
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32)]
        _LIB = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def aggregate_sweeps(paths: Sequence[str], rots: np.ndarray,
                     trans: np.ndarray, time_lags: np.ndarray,
                     load_dim: int, use_dim: Sequence[int],
                     max_points: int, remove_close: float = 0.0):
    """Fused load+transform+pad of key frame + sweeps.

    Returns (points [max_points, len(use_dim)+1] float32, n_valid).
    """
    lib = get_lib()
    n_use = len(use_dim)
    out = np.zeros((max_points, n_use + 1), np.float32)
    if lib is None:
        total = 0
        for p, r, t, lag in zip(paths, rots, trans, time_lags):
            pts = np.fromfile(p, dtype=np.float32).reshape(-1, load_dim)
            xyz = pts[:, :3] @ np.asarray(r, np.float32).reshape(3, 3).T \
                + np.asarray(t, np.float32)
            if remove_close > 0:
                keep = (np.abs(pts[:, 0]) >= remove_close) | \
                    (np.abs(pts[:, 1]) >= remove_close)
                pts, xyz = pts[keep], xyz[keep]
            rows = np.concatenate(
                [xyz, pts[:, list(use_dim)[3:]],
                 np.full((len(pts), 1), lag, np.float32)], axis=-1)
            take = min(len(rows), max_points - total)
            out[total:total + take] = rows[:take]
            total += take
            if total >= max_points:
                break
        return out, total
    c_paths = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    n = lib.aggregate_sweeps(
        c_paths, np.ascontiguousarray(rots, np.float32).reshape(-1),
        np.ascontiguousarray(trans, np.float32).reshape(-1),
        np.ascontiguousarray(time_lags, np.float32),
        len(paths), load_dim,
        np.ascontiguousarray(use_dim, np.int32), n_use,
        float(remove_close), out, max_points)
    return out, int(n)


def normalize_images(imgs: np.ndarray, mean, std,
                     scale: float = 1.0 / 255.0) -> np.ndarray:
    """[N, H, W, 3] uint8 -> normalized float32 (multi-threaded)."""
    lib = get_lib()
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        return (imgs.astype(np.float32) * scale - mean) / std
    imgs = np.ascontiguousarray(imgs, np.uint8)
    out = np.empty(imgs.shape, np.float32)
    n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    lib.normalize_images(imgs, out, n, h, w, mean, std, float(scale))
    return out


def range_filter_pad(points: np.ndarray, pcr, max_points: int):
    """Range filter + static pad.  Returns (out, n_valid)."""
    lib = get_lib()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        m = ((points[:, 0] > pcr[0]) & (points[:, 1] > pcr[1]) &
             (points[:, 2] > pcr[2]) & (points[:, 0] < pcr[3]) &
             (points[:, 1] < pcr[4]) & (points[:, 2] < pcr[5]))
        kept = points[m][:max_points]
        out = np.zeros((max_points, points.shape[1]), np.float32)
        out[:len(kept)] = kept
        return out, len(kept)
    out = np.zeros((max_points, points.shape[1]), np.float32)
    n = lib.range_filter_pad(points, len(points), points.shape[1],
                             np.ascontiguousarray(pcr, np.float32), out,
                             max_points)
    return out, int(n)


def points_to_depth_maps(points: np.ndarray, rots, trans, intrins,
                         post_rots, post_trans, height: int, width: int,
                         downsample: int, d_min: float, d_max: float):
    """Fused lidar -> per-camera min-depth maps; returns
    [n_cam, H/ds, W/ds] float32 or None when the library is absent
    (callers fall back to the numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    rots = np.ascontiguousarray(rots, np.float32).reshape(-1)
    trans = np.ascontiguousarray(trans, np.float32).reshape(-1)
    intrins = np.ascontiguousarray(intrins, np.float32).reshape(-1)
    post_rots = np.ascontiguousarray(post_rots, np.float32).reshape(-1)
    post_trans = np.ascontiguousarray(post_trans,
                                      np.float32).reshape(-1)
    n_cam = len(trans) // 3
    fh, fw = height // downsample, width // downsample
    out = np.empty((n_cam, fh, fw), np.float32)
    lib.points_to_depth_maps(points, points.shape[0], points.shape[1],
                             rots, trans, intrins, post_rots, post_trans,
                             n_cam, height, width, downsample,
                             float(d_min), float(d_max), out)
    return out
