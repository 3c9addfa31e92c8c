"""ctypes bindings to the native host library (vision3d_tpu/csrc).

Builds the shared library on first use (g++, no pybind11 needed) and
exposes numpy-friendly wrappers. Every function has a pure-Python
fallback elsewhere in the package (core.voxelize.voxelize_np,
core.boxes.points_in_cuboids_mask, data.kitti.filter_camera_fov) — the
native path is a drop-in speedup for the data-loader hot loops the
reference delegated to spconv/numpy (SURVEY X1, P8, P11).
"""

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_CSRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "csrc")
_SO = osp.join(_CSRC, "libvision3d_host.so")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not osp.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        osp.join(_CSRC, "vision3d_host.cpp")
    ):
        subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int

    lib.hard_voxelize.restype = c_int
    lib.hard_voxelize.argtypes = [
        f32p, c_int, c_int, f32p, f32p, i32p, c_int, c_int, f32p, i32p, i32p,
    ]
    lib.points_in_cuboids_mask.restype = None
    lib.points_in_cuboids_mask.argtypes = [f32p, c_int, c_int, f32p, c_int, u8p]
    lib.filter_camera_fov.restype = None
    lib.filter_camera_fov.argtypes = [f32p, c_int, c_int, f32p, f32p, f32p, f32p, u8p]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def hard_voxelize(points: np.ndarray, cfg):
    """Native equivalent of core.voxelize.voxelize_np (same truncation)."""
    from vision3d_tpu.core.voxelize import grid_dims_xyz

    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    N, K = cfg.max_voxels, cfg.max_occupancy
    features = np.zeros((N, K, c), np.float32)
    coords = np.zeros((N, 3), np.int32)
    occupancy = np.zeros((N,), np.int32)
    nv = lib.hard_voxelize(
        points, n, c,
        np.asarray(cfg.voxel_size, np.float32),
        np.asarray(cfg.grid_bounds[:3], np.float32),
        np.asarray(grid_dims_xyz(cfg), np.int32),
        N, K, features, coords, occupancy,
    )
    return features[:nv], coords[:nv], occupancy[:nv]


def points_in_cuboids_mask(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n = len(points)
    m = len(boxes)
    out = np.zeros((n, m), np.uint8)
    if n and m:
        lib.points_in_cuboids_mask(points, n, points.shape[1], boxes, m, out)
    return out.astype(bool)


def filter_camera_fov(calib, points: np.ndarray) -> np.ndarray:
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    keep = np.zeros((len(points),), np.uint8)
    lib.filter_camera_fov(
        points, len(points), points.shape[1],
        np.ascontiguousarray(calib.P2, np.float32),
        np.ascontiguousarray(calib.R0, np.float32),
        np.ascontiguousarray(calib.V2C, np.float32),
        np.asarray(calib.WH, np.float32),
        keep,
    )
    return points[keep.astype(bool)]
