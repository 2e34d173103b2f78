"""ctypes bindings for the native host data-plane library (csrc/).

Provides C++ implementations of the host-side hot paths with transparent
numpy fallbacks when the shared library has not been built
(``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc", "libfbbev_host.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _LIB_PATH
    if not os.path.exists(path):
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.compute_voxel_ranks.argtypes = [
        f32p, i32p, ctypes.c_int64, f32p, f32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.sort_ranks_intervals.restype = ctypes.c_int64
    lib.sort_ranks_intervals.argtypes = [
        i32p, ctypes.c_int64, i32p, i32p, i32p, i32p]
    lib.rasterize_depth.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, f32p]
    lib.normalize_image_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, f32p, f32p, f32p]
    _lib = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def compute_voxel_ranks(coor: np.ndarray, batch_idx: np.ndarray,
                        grid_lower, grid_interval, grid_size,
                        num_samples: int) -> np.ndarray:
    """coor (P, 3) f32, batch_idx (P,) i32 -> ranks (P,) i32."""
    coor = np.ascontiguousarray(coor, np.float32)
    batch_idx = np.ascontiguousarray(batch_idx, np.int32)
    nx, ny, nz = (int(g) for g in grid_size)
    lib = _load()
    P = coor.shape[0]
    out = np.empty(P, np.int32)
    if lib is None:
        c = ((coor - np.asarray(grid_lower, np.float32))
             / np.asarray(grid_interval, np.float32)).astype(np.int32)
        valid = ((c[:, 0] >= 0) & (c[:, 0] < nx) & (c[:, 1] >= 0)
                 & (c[:, 1] < ny) & (c[:, 2] >= 0) & (c[:, 2] < nz))
        rank = (batch_idx.astype(np.int64) * (nz * ny * nx)
                + c[:, 2] * (ny * nx) + c[:, 1] * nx + c[:, 0])
        return np.where(valid, rank,
                        num_samples * nz * ny * nx).astype(np.int32)
    lo = np.asarray(grid_lower, np.float32)
    iv = np.asarray(grid_interval, np.float32)
    lib.compute_voxel_ranks(_f32p(coor), _i32p(batch_idx), P, _f32p(lo),
                            _f32p(iv), nx, ny, nz, num_samples, _i32p(out))
    return out


def sort_ranks_intervals(ranks: np.ndarray):
    """Sorted order + interval table for fixed-geometry serving."""
    ranks = np.ascontiguousarray(ranks, np.int32)
    P = ranks.shape[0]
    lib = _load()
    if lib is None:
        order = np.argsort(ranks, kind="stable").astype(np.int32)
        rs = ranks[order]
        starts = np.flatnonzero(
            np.concatenate([[True], rs[1:] != rs[:-1]])).astype(np.int32)
        lengths = np.diff(np.concatenate([starts, [P]])).astype(np.int32)
        return order, rs, starts, lengths
    order = np.empty(P, np.int32)
    rs = np.empty(P, np.int32)
    starts = np.empty(P, np.int32)
    lengths = np.empty(P, np.int32)
    n = lib.sort_ranks_intervals(_i32p(ranks), P, _i32p(order), _i32p(rs),
                                 _i32p(starts), _i32p(lengths))
    return order, rs, starts[:n].copy(), lengths[:n].copy()


def rasterize_depth(points: np.ndarray, H: int, W: int,
                    depth_bounds: Tuple[float, float]) -> np.ndarray:
    """(P, 3) projected points (u, v, depth) -> (H, W) min-depth map."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is None:
        from fbbev_tpu.data.transforms import points_to_depth_map
        return points_to_depth_map(points, H, W,
                                   (depth_bounds[0], depth_bounds[1], 0.0))
    out = np.empty((H, W), np.float32)
    lib.rasterize_depth(_f32p(points), points.shape[0], H, W,
                        float(depth_bounds[0]), float(depth_bounds[1]),
                        _f32p(out))
    return out


def normalize_image_u8(img: np.ndarray, mean, std) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    mean = np.asarray(mean, np.float32)
    if lib is None:
        return (img.astype(np.float32) - mean) / np.asarray(std, np.float32)
    inv_std = (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    out = np.empty(img.shape, np.float32)
    lib.normalize_image_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.size // 3, _f32p(mean), _f32p(inv_std), _f32p(out))
    return out
