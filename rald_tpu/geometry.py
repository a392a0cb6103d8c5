"""Geometry: point normalization, polar<->cartesian, FOV masks, rigid transforms.

Capability parity with reference ``utils/utils.py:9-112`` and
``dataset_preprocessor/lidar.py:49-63``, re-designed for TPU:

- every function is pure and shape-polymorphic over leading axes so it can be
  ``jit``-ed / ``vmap``-ed on device, yet also runs on plain numpy arrays in
  the host input pipeline (dispatch on input type);
- FOV filtering returns a *mask* (static shape) instead of a compacted array;
  compaction happens only at host boundaries (``compact_points``).

Conventions (identical to the reference):
- polar points are (range [m], azimuth [deg], elevation [deg]);
- ``cartesian2polar`` negates azimuth (reference ``lidar.py:53``) and
  ``polar2cartesian`` inverts that (reference ``lidar.py:59``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _xp(x):
    """Pick numpy for host arrays, jax.numpy otherwise (keeps pipeline cheap)."""
    return np if isinstance(x, np.ndarray) else jnp


def norm_scale_offset(pc_range):
    """Per-axis (offset, scale) of the [-1, 1] normalization box.

    ``pc_range`` is [x_min, y_min, z_min, x_max, y_max, z_max]
    (reference: utils/utils.py:61-66).
    """
    pc_range = np.asarray(pc_range, dtype=np.float32)
    offset = (pc_range[3:6] + pc_range[0:3]) / 2.0
    scale = (pc_range[3:6] - pc_range[0:3]) / 2.0
    return offset, scale


def norm_points(points, pc_range, anisotropic: bool = True, isotropic: bool = False):
    """Normalize points into [-1, 1]^3 (reference: utils/utils.py:78-104).

    ``anisotropic`` scales each axis independently; ``isotropic`` divides all
    axes by the largest half-extent. Exactly one should be set (matching the
    reference configs); if both are set the isotropic result wins, mirroring
    the reference's sequential overwrite.
    """
    xp = _xp(points)
    offset, scale = norm_scale_offset(pc_range)
    out = points
    if anisotropic:
        out = (points - offset) / scale
    if isotropic:
        out = (points - offset) / float(scale.max())
    if not anisotropic and not isotropic:
        out = xp.zeros_like(points)
    return out


def inverse_norm_points(points, pc_range, anisotropic: bool = True, isotropic: bool = False):
    """Undo :func:`norm_points` (reference: utils/utils.py:50-76)."""
    xp = _xp(points)
    offset, scale = norm_scale_offset(pc_range)
    out = points
    if anisotropic:
        out = points * scale + offset
    if isotropic:
        out = points * float(scale.max()) + offset
    if not anisotropic and not isotropic:
        out = xp.zeros_like(points)
    return out


def cartesian2polar(points):
    """(x,y,z) -> (r [m], az [deg], el [deg]) (reference: lidar.py:49-55)."""
    xp = _xp(points)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r = xp.sqrt(x * x + y * y + z * z)
    az = -xp.degrees(xp.arctan2(y, x))
    el = xp.degrees(xp.arcsin(z / r))
    return xp.stack([r, az, el], axis=-1)


def polar2cartesian(points):
    """(r, az [deg], el [deg]) -> (x,y,z) (reference: lidar.py:57-63)."""
    xp = _xp(points)
    r = points[..., 0]
    az = -xp.radians(points[..., 1])
    el = xp.radians(points[..., 2])
    x = r * xp.cos(el) * xp.cos(az)
    y = r * xp.cos(el) * xp.sin(az)
    z = r * xp.sin(el)
    return xp.stack([x, y, z], axis=-1)


def fov_mask(points, eps: float = 0.0):
    """Boolean mask of points strictly inside the open cube (-1, 1)^3.

    Static-shape analogue of the reference's compacting filter
    (utils/utils.py:106-112).
    """
    xp = _xp(points)
    return xp.all((points > -1 + eps) & (points < 1 - eps), axis=-1)


def remove_points_outside_fov(points: np.ndarray) -> np.ndarray:
    """Host-side compacting FOV filter (reference: utils/utils.py:106-112)."""
    points = np.asarray(points)
    return points[fov_mask(points)]


def polar_range_mask(points, range_limits):
    """Mask of polar points inside [r, az, el] limits.

    ``range_limits`` is ``[[r_lo, r_hi], [az_lo, az_hi], [el_lo, el_hi]]``
    (static-shape analogue of reference ``lidar.py:92-109``).
    """
    xp = _xp(points)
    lo = xp.asarray([range_limits[0][0], range_limits[1][0], range_limits[2][0]])
    hi = xp.asarray([range_limits[0][1], range_limits[1][1], range_limits[2][1]])
    return xp.all((points >= lo) & (points <= hi), axis=-1)


def filter_points_polar(points: np.ndarray, range_limits) -> np.ndarray:
    """Host-side compacting polar FOV filter (reference: lidar.py:92-109)."""
    points = np.asarray(points)
    return points[polar_range_mask(points, range_limits)]


def remove_empty_points(points: np.ndarray) -> np.ndarray:
    """Drop all-zero (invalid) lidar returns (reference: lidar.py:111-121)."""
    mask = np.linalg.norm(points[:, :3], axis=1) > 0
    return points[mask]


def transform_points(points, T):
    """Apply a 4x4 homogeneous transform to (..., 3) points
    (reference: lidar.py:43-47)."""
    xp = _xp(points)
    return points @ xp.asarray(T[:3, :3], dtype=points.dtype).T + xp.asarray(
        T[:3, 3], dtype=points.dtype
    )


def get_inverse_tf(T):
    """Closed-form inverse of a rigid 4x4 transform (reference: utils/utils.py:9-21)."""
    xp = _xp(T) if not isinstance(T, (list, tuple)) else np
    T = xp.asarray(T)
    R = T[0:3, 0:3]
    t = T[0:3, 3].reshape(3, 1)
    top = xp.concatenate([R.T, -R.T @ t], axis=1)
    bottom = xp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return xp.concatenate([top, bottom], axis=0)


def compact_points(points: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host-boundary compaction of a masked point set."""
    return np.asarray(points)[np.asarray(mask)]
