"""ctypes bindings for the first-party C++ host ops (``native/rald_native.cpp``).

The TPU compute path never calls these — they serve the *host* side of the
pipeline, replacing the reference's third-party native wheels (SURVEY.md
§2b): spconv voxelization, scipy cKDTree Chamfer, torch_cluster fps.

``available()`` reports whether the shared library is present; every public
function transparently falls back to the numpy/JAX implementation when it
is not (and when ``RALD_NATIVE=0``). Build with ``make -C native`` or let
:func:`build` invoke g++ on demand.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "librald_native.so"
_SRC = Path(__file__).resolve().parents[2] / "native" / "rald_native.cpp"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library with g++; returns success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-Wall",
             "-o", str(_LIB_PATH), str(_SRC)],
            check=True, capture_output=True, text=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("RALD_NATIVE", "1") == "0":
        _load_failed = True
        return None
    if not _LIB_PATH.exists() and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None

    i64, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.rald_voxelize.restype = i64
    lib.rald_voxelize.argtypes = [f32p, i64, i64, f64p, f64p, i64, i64, f32p, i32p, i32p]
    lib.rald_nn_dists.restype = None
    lib.rald_nn_dists.argtypes = [f32p, i64, f32p, i64, f32p, ctypes.c_void_p]
    lib.rald_chamfer.restype = ctypes.c_double
    lib.rald_chamfer.argtypes = [f32p, i64, f32p, i64]
    lib.rald_fps.restype = None
    lib.rald_fps.argtypes = [f32p, i64, i64, i64, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize(points, voxel_size, pc_range, max_points_per_voxel: int, max_voxels: int):
    """Native first-come voxelization; same contract as
    :func:`rald_tpu.data.voxelizer.voxelize` (falls back to it)."""
    from rald_tpu.data.voxelizer import VoxelGrid, grid_size_of
    from rald_tpu.data.voxelizer import voxelize as np_voxelize

    lib = _load()
    if lib is None:
        return np_voxelize(points, voxel_size, pc_range, max_points_per_voxel, max_voxels)

    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    vs = np.ascontiguousarray(voxel_size, np.float64)
    pr = np.ascontiguousarray(pc_range, np.float64)
    out_voxels = np.zeros((max_voxels, max_points_per_voxel, c), np.float32)
    out_coords = np.zeros((max_voxels, 3), np.int32)
    out_num = np.zeros((max_voxels,), np.int32)
    n_vox = lib.rald_voxelize(
        points, n, c, vs, pr, max_points_per_voxel, max_voxels,
        out_voxels, out_coords, out_num,
    )
    return VoxelGrid(
        voxels=out_voxels[:n_vox],
        coords=out_coords[:n_vox],
        num_points=out_num[:n_vox],
        grid_size=grid_size_of(pc_range, voxel_size),
    )


def nn_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact euclidean NN distance from each point of ``a`` to set ``b``."""
    lib = _load()
    a = np.ascontiguousarray(np.asarray(a, np.float32).reshape(-1, 3))
    b = np.ascontiguousarray(np.asarray(b, np.float32).reshape(-1, 3))
    if lib is None:
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.sqrt(d2.min(axis=1)).astype(np.float32)
    out = np.empty((len(a),), np.float32)
    lib.rald_nn_dists(a, len(a), b, len(b), out, None)
    return out


def chamfer(pred: np.ndarray, gt: np.ndarray) -> float:
    """Symmetric Chamfer (reference utils/utils.py:116-142 semantics)."""
    lib = _load()
    pred = np.ascontiguousarray(np.asarray(pred, np.float32).reshape(-1, 3))
    gt = np.ascontiguousarray(np.asarray(gt, np.float32).reshape(-1, 3))
    if len(pred) == 0:
        return float("inf")
    if lib is None:
        from rald_tpu.eval.chamfer import chamfer_distance

        return chamfer_distance(pred, gt)
    return float(lib.rald_chamfer(pred, len(pred), gt, len(gt)))


def fps(points: np.ndarray, num_samples: int, start_idx: int = 0) -> np.ndarray:
    """Farthest point sampling indices on the host."""
    lib = _load()
    points = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 3))
    if lib is None:
        from rald_tpu.ops.fps import farthest_point_sampling

        return np.asarray(farthest_point_sampling(points, num_samples, start_idx))
    out = np.empty((num_samples,), np.int32)
    lib.rald_fps(points, len(points), num_samples, start_idx, out)
    return out
