"""Inference query-point generation (reference ``utils/utils.py:147-176``).

Uniform random points in the normalized box: full [-1,1]^3 under
anisotropic normalization, per-axis scaled bounds under isotropic.
Host-side numpy with an explicit Generator (the reference uses the global
``np.random``; an explicit seed gives reproducible eval).
"""
from __future__ import annotations

import numpy as np


def generate_query_points(
    num_points: int,
    pc_range,
    anisotropic: bool = True,
    isotropic: bool = False,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    rng = rng or np.random.default_rng()
    pc_range = np.asarray(pc_range, np.float64)
    scale = (pc_range[3:6] - pc_range[0:3]) / 2.0
    if anisotropic:
        lo, hi = -np.ones(3), np.ones(3)
    if isotropic:
        lo = -(scale / scale.max())
        hi = scale / scale.max()
    return rng.uniform(lo, hi, size=(num_points, 3)).astype(np.float32)
