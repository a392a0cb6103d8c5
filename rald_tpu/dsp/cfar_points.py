"""Test-set CFAR helper-point extraction (static-shape, jit-compiled).

Behavioral parity with reference ``dataset_preprocessor/cache_test_cfar_utils.py``:
``rae_interpo`` (:26-53), ``weighted_allocation`` (:100-141),
``RA2DDetector``/``RA2DDetectorTensor`` (:55-98, :143-160) and
``cube_idx2coord`` (:162-208).

TPU re-design: the reference loops over 256 range slices doing
``np.argpartition`` per slice with a data-dependent budget. Here each slice is
argsorted once (descending) and the budgeted selection becomes a single
static-shape gather: output position j belongs to slice r with rank
``j - offset[r]`` where ``offset = cumsum(budgets)`` — so the result is the
same slice-major, intensity-sorted point list with a fixed total count.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rald_tpu.constants import WAVELENGTH_TO_APERTURE_RATIO


def resize_linear_align_corners(x: jnp.ndarray, out_sizes: tuple[int, ...], axes: tuple[int, ...]) -> jnp.ndarray:
    """Multi-axis linear resize with align_corners=True semantics.

    Matches ``torch.nn.functional.interpolate(..., align_corners=True)`` as
    used for the radar-cube upsample in the dataset
    (reference: Coloradar_dataset.py:465-474).
    """
    for axis, out_size in zip(axes, out_sizes):
        n_in = x.shape[axis]
        if n_in == out_size:
            continue
        if out_size == 1:
            pos = jnp.zeros((1,), dtype=jnp.float32)
        elif n_in == 1:
            pos = jnp.zeros((out_size,), dtype=jnp.float32)
        else:
            pos = jnp.linspace(0.0, n_in - 1.0, out_size)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = (pos - lo.astype(pos.dtype)).astype(x.dtype)
        x_lo = jnp.take(x, lo, axis=axis)
        x_hi = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x_lo + frac.reshape(shape) * (x_hi - x_lo)
    return x


def rae_interpo(rae_map: jnp.ndarray, R: int, A: int, E: int) -> jnp.ndarray:
    """Trilinear (half-pixel / align_corners=False) resize of (..., R, A, E).

    Matches ``F.interpolate(mode='trilinear', align_corners=False)``
    (reference: cache_test_cfar_utils.py:26-53); ``jax.image.resize`` with a
    linear kernel uses the same half-pixel-center convention.
    """
    batch_shape = rae_map.shape[:-3]
    out_shape = batch_shape + (R, A, E)
    return jax.image.resize(rae_map, out_shape, method="trilinear")


def weighted_allocation(weights: jnp.ndarray, total: int) -> jnp.ndarray:
    """Proportional integer allocation; the max-weight item absorbs rounding
    residue (reference: cache_test_cfar_utils.py:100-141)."""
    weights = weights.astype(jnp.float32)
    n = weights.shape[0]
    wsum = jnp.sum(weights)

    ratios = weights / jnp.where(wsum == 0, 1.0, wsum)
    alloc = jnp.floor(ratios * total).astype(jnp.int32)
    diff = total - jnp.sum(alloc)
    max_idx = jnp.argmax(weights)
    alloc = alloc.at[max_idx].add(diff)

    # All-zero weights: even split with the first `total % n` slots +1.
    base = total // n
    remain = total % n
    even = jnp.full((n,), base, dtype=jnp.int32)
    even = even.at[: int(remain)].add(1) if remain else even
    return jnp.where(wsum == 0, even, alloc)


@partial(jax.jit, static_argnames=("total",))
def budgeted_topk(cube: jnp.ndarray, budgets: jnp.ndarray, total: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-range-slice budgeted peak picking with a static output count.

    Args:
        cube: (R, A, E) intensity cube.
        budgets: (R,) int budgets summing to ``total``.
        total: static output count.

    Returns:
        ``(peaks, intensities)``: (total, 3) int32 (r, a, e) indices ordered
        slice-major then by descending intensity within each slice — the same
        ordering as the reference's per-slice argpartition+sort loop
        (cache_test_cfar_utils.py:70-91) — and the (total,) intensities.
    """
    R, A, E = cube.shape
    flat = cube.reshape(R, A * E)
    order = jnp.argsort(-flat, axis=1)  # descending within each slice

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(budgets)])
    j = jnp.arange(total)
    r = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32) - 1
    r = jnp.clip(r, 0, R - 1)
    k = (j - offsets[r]).astype(jnp.int32)
    k = jnp.clip(k, 0, A * E - 1)

    cell = order[r, k]
    a = (cell // E).astype(jnp.int32)
    e = (cell % E).astype(jnp.int32)
    peaks = jnp.stack([r, a, e], axis=1)
    intensities = flat[r, cell]
    return peaks, intensities


def cube_idx2coord_axes(r_size: int, a_size: int, e_size: int, max_range: float,
                        return_in_degrees: bool = False):
    """Range/azimuth/elevation axes of the upsampled cube
    (reference: cache_test_cfar_utils.py:162-208)."""
    range_cell_size = max_range / r_size
    range_axis = np.arange(range_cell_size, max_range + range_cell_size / 2, range_cell_size)

    def angle_axis(n):
        w = np.flip(np.linspace(-np.pi, np.pi, n))
        ax = np.arcsin(np.clip(w / (2 * np.pi * WAVELENGTH_TO_APERTURE_RATIO), -1, 1))
        ax[0] = np.pi / 2
        ax[-1] = -np.pi / 2
        return -ax

    azimuth_axis = angle_axis(a_size)
    elevation_axis = angle_axis(e_size)
    if return_in_degrees:
        azimuth_axis = np.rad2deg(azimuth_axis)
        elevation_axis = np.rad2deg(elevation_axis)
    return range_axis, azimuth_axis, elevation_axis


def cube_idx2coord(idx, r_size: int, a_size: int, e_size: int, max_range: float,
                   return_in_degrees: bool = False):
    """(N, 3) (r, a, e) cube indices -> polar coordinates."""
    range_axis, azimuth_axis, elevation_axis = cube_idx2coord_axes(
        r_size, a_size, e_size, max_range, return_in_degrees
    )
    idx = jnp.asarray(idx)
    ra = jnp.asarray(range_axis, jnp.float32)[idx[:, 0]]
    az = jnp.asarray(azimuth_axis, jnp.float32)[idx[:, 1]]
    el = jnp.asarray(elevation_axis, jnp.float32)[idx[:, 2]]
    return jnp.stack([ra, az, el], axis=1)


@partial(jax.jit, static_argnames=("tgt_r", "tgt_a", "tgt_e", "total", "max_range"))
def cfar_points_from_cube(
    intensity_cube: jnp.ndarray,
    tgt_r: int,
    tgt_a: int,
    tgt_e: int,
    total: int,
    max_range: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full test-set CFAR pipeline: upsample -> budget -> top-k -> polar coords.

    One fused jit region replacing the per-frame Python loop in
    ``cache_test_cfar.py:_subproc_process_radar`` (:77-107). Returns
    ``(points, intensities)`` where points are (total, 3) polar (r [m],
    az [deg], el [deg]); FOV filtering stays a host-side compaction.
    """
    up = rae_interpo(intensity_cube, tgt_r, tgt_a, tgt_e)  # (R', A', E')
    weights = up.sum(axis=(1, 2)) / up.sum()
    budgets = weighted_allocation(weights, total)
    peaks, intensities = budgeted_topk(up, budgets, total)
    coords = cube_idx2coord(peaks, tgt_r, tgt_a, tgt_e, max_range, return_in_degrees=True)
    return coords, intensities
