"""Batched nearest-neighbor min-squared-distance Pallas kernel.

The Chamfer/F-score inner loop: for point sets ``a`` (B, N, 3) and ``b``
(B, M, 3), compute ``d2min[bi, i] = min_j |a[bi, i] - b[bi, j]|^2``.

Why a kernel: the jnp formulation (``|a|^2 + |b|^2 - 2 a b^T`` then a min
reduce, eval/chamfer.py) lowers to a dot whose (N, M) f32 product block is
materialized through HBM before the reduce — at the product-eval sizes
(N=5e5 refined predictions, M=1e4 GT points, reference
engine_generation.py:250-310 + utils/utils.py:116-142) that is ~0.5 GB of
HBM round-trip per frame per direction, which made the metric stage the
largest device cost of the eval loop. This kernel forms each (TA, TB)
distance block in VMEM with exact f32 subtract-square VPU ops (no
``a^2 - 2ab + b^2`` cancellation around zero distances) and folds a
running min into a (TA, 1) output accumulator that lives in VMEM across
the whole b sweep. HBM traffic: ``a`` once, ``b`` ceil(N/TA) times, the
(N, 1) output once — a few MB per frame instead of ~1 GB.

Padding contract (the wrapper enforces it): rows beyond each frame's real
count carry coordinate ``BIG`` so they never win a min against real rows;
the caller masks the garbage minima OF padded rows. The coordinate axis is
zero-padded 3 -> 8 so the K loop stays in one sublane tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # pad coordinate: real points are O(10 m), d2 vs a pad ~ 1e18


def _nn_min_kernel(a_ref, bt_ref, out_ref):
    """One (batch, a-tile, b-tile) grid step; j (b-tiles) is innermost so the
    out block is a VMEM-resident accumulator across the b sweep."""
    j = pl.program_id(2)
    a = a_ref[0]   # (TA, 8) f32
    bt = bt_ref[0]  # (8, TB) f32
    acc = jnp.zeros((a.shape[0], bt.shape[1]), jnp.float32)
    for k in range(3):  # coords 4..7 are zero padding on both sides
        diff = a[:, k : k + 1] - bt[k : k + 1, :]  # (TA, TB) broadcast
        acc += diff * diff
    m = jnp.min(acc, axis=1, keepdims=True)  # (TA, 1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = m

    @pl.when(j > 0)
    def _():
        out_ref[0] = jnp.minimum(out_ref[0], m)


def _nn_min_both_kernel(a_ref, bt_ref, row_ref, colpart_ref):
    """One (batch, a-tile, b-tile) grid step computing BOTH reductions of
    the shared distance block: the row min (per-a nearest b) accumulates in
    VMEM across the innermost b sweep like :func:`_nn_min_kernel`; the col
    min (per-b nearest a) is written as an (n_i, TB) PARTIAL the wrapper
    min-reduces — Chamfer needs both directions at the same (a, b), and the
    distance block is by far the dominant VPU cost, so forming it once
    instead of twice is a ~1.75x exact saving (min is associative, so the
    partial+reduce order is bitwise-identical to a flat sweep)."""
    j = pl.program_id(2)
    a = a_ref[0]   # (TA, 8) f32
    bt = bt_ref[0]  # (8, TB) f32
    acc = jnp.zeros((a.shape[0], bt.shape[1]), jnp.float32)
    for k in range(3):  # coords 4..7 are zero padding on both sides
        diff = a[:, k : k + 1] - bt[k : k + 1, :]
        acc += diff * diff
    rm = jnp.min(acc, axis=1, keepdims=True)  # (TA, 1)

    @pl.when(j == 0)
    def _():
        row_ref[0] = rm

    @pl.when(j > 0)
    def _():
        row_ref[0] = jnp.minimum(row_ref[0], rm)

    colpart_ref[0, 0, 0] = jnp.min(acc, axis=0)  # (TB,) partial for this a-tile


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b", "interpret"))
def nn_min_sq_both(
    a: jax.Array,
    b: jax.Array,
    tile_a: int = 1024,
    tile_b: int = 1024,
    interpret: bool = False,
):
    """(B, N, 3), (B, M, 3) f32 -> ((B, N), (B, M)) min squared distances,
    BOTH directions from one sweep of the (N, M) distance blocks.

    Same padding contract as :func:`nn_min_sq_batch`: rows carrying ``BIG``
    coordinates never win either min; their own output entries are garbage
    the caller masks. Results are bitwise-identical to two independent
    :func:`nn_min_sq_batch` calls (min order is associative)."""
    bsz, n, _ = a.shape
    m = b.shape[1]
    ta = min(tile_a, max(8, n))
    tb = min(tile_b, max(128, m))
    a = _pad_rows(a.astype(jnp.float32), ta, BIG)
    b = _pad_rows(b.astype(jnp.float32), tb, BIG)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 5)))
    bt = jnp.pad(b, ((0, 0), (0, 0), (0, 5))).transpose(0, 2, 1)  # (B, 8, M)
    n_i = a.shape[1] // ta
    n_j = bt.shape[2] // tb

    row, colpart = pl.pallas_call(
        _nn_min_both_kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[
            pl.BlockSpec((1, ta, 8), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tb), lambda bi, i, j: (bi, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ta, 1), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM),
            # The i-indexed partial lives on its own leading axis and keeps a
            # singleton second-to-last dim: Mosaic requires the block's last
            # two dims be divisible by (8, 128) or EQUAL to the array dims —
            # (1, tb) vs array (1, M) satisfies that, while a (1, 1, tb)
            # block over (B, n_i, M) does not (n_i is not a tile multiple).
            pl.BlockSpec((1, 1, 1, tb), lambda bi, i, j: (bi, i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, a.shape[1], 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_i, 1, bt.shape[2]), jnp.float32),
        ],
        interpret=interpret,
    )(a, bt)
    return row[:, :n, 0], jnp.min(colpart[:, :, 0, :], axis=1)[:, :m]


def _pad_rows(x: jax.Array, mult: int, value: float) -> jax.Array:
    pad = (-x.shape[1]) % mult
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), constant_values=value)
    return x


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b", "interpret"))
def nn_min_sq_batch(
    a: jax.Array,
    b: jax.Array,
    tile_a: int = 1024,
    tile_b: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, 3), (B, M, 3) f32 -> (B, N) f32 min squared distances.

    Rows already carrying ``BIG`` coordinates (masked-out points) never win
    a min; their own output entries are garbage the caller must mask.
    """
    bsz, n, _ = a.shape
    ta = min(tile_a, max(8, n))
    tb = min(tile_b, max(128, b.shape[1]))
    a = _pad_rows(a.astype(jnp.float32), ta, BIG)
    b = _pad_rows(b.astype(jnp.float32), tb, BIG)
    # coord axis 3 -> 8 with zeros (contributes 0 to every distance)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 5)))
    bt = jnp.pad(b, ((0, 0), (0, 0), (0, 5))).transpose(0, 2, 1)  # (B, 8, M)
    n_i = a.shape[1] // ta
    n_j = bt.shape[2] // tb

    out = pl.pallas_call(
        _nn_min_kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[
            pl.BlockSpec((1, ta, 8), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tb), lambda bi, i, j: (bi, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ta, 1), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, a.shape[1], 1), jnp.float32),
        interpret=interpret,
    )(a, bt)
    return out[:, :n, 0]
