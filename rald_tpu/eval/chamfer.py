"""Exact Chamfer distance, TPU-native (tiled brute force on the MXU).

Capability parity with ``utils/utils.py:116-142``: symmetric mean euclidean
nearest-neighbor distance, ``0.5 * mean(d_pred->gt) + 0.5 * mean(d_gt->pred)``,
``inf`` for an empty prediction. The reference queries two scipy cKDTrees
point-by-point in Python; trees don't map to TPUs, but exact brute force
does — squared distances come from one ``|a|^2 + |b|^2 - 2 a.b^T`` matmul
per (a-tile, b-tile) pair on the MXU, with a ``lax.scan`` running-min over
b-tiles. O(N*M) FLOPs are cheap compared to the host round-trip the
reference pays; results are exact, so metric parity is bitwise-safe up to
float summation order.

Ragged point counts (thresholded predictions vary per frame) are handled by
padding to a static cap + validity masks (XLA needs static shapes);
:func:`chamfer_distance` is the host convenience wrapper that pads to the
next power of two to bound recompilation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9  # coordinate for padded points: real pts are O(10m), so d2 ~ 1e18 dominates


def _pad_to(x: jax.Array, n: int, value: float) -> jax.Array:
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)), constant_values=value)


@partial(jax.jit, static_argnames=("chunk_a", "chunk_b"))
def nearest_neighbor_dists(
    a: jax.Array, b: jax.Array, chunk_a: int = 4096, chunk_b: int = 65536
) -> jax.Array:
    """For each point in ``a`` (N,3): euclidean distance to nearest in ``b`` (M,3).

    Pad ``b``'s invalid rows with a huge coordinate — they never win the min.
    Padded ``a`` rows produce garbage values the caller masks out.
    """
    n = a.shape[0]
    ca = min(chunk_a, max(n, 8))
    a_pad, _ = _pad_mult(a, ca)
    cb = min(chunk_b, max(b.shape[0], 8))
    b_pad, _ = _pad_mult(b, cb, value=_BIG)
    b_chunks = b_pad.reshape(-1, cb, 3)

    def per_a_chunk(ablk):
        a2 = jnp.sum(ablk * ablk, axis=-1, keepdims=True)

        def over_b(carry, bblk):
            b2 = jnp.sum(bblk * bblk, axis=-1)
            d2 = a2 + b2[None, :] - 2.0 * jnp.dot(ablk, bblk.T, preferred_element_type=jnp.float32)
            return jnp.minimum(carry, jnp.min(d2, axis=1)), None

        init = jnp.full((ablk.shape[0],), jnp.inf, dtype=jnp.float32)
        out, _ = jax.lax.scan(over_b, init, b_chunks)
        return jnp.sqrt(jnp.maximum(out, 0.0))

    dists = jax.lax.map(per_a_chunk, a_pad.reshape(-1, ca, 3))
    return dists.reshape(-1)[:n]


def _pad_mult(x: jax.Array, multiple: int, value: float = 0.0):
    pad = (-x.shape[0]) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=value)
    return x, pad


@partial(jax.jit, static_argnames=("chunk_a", "chunk_b"))
def masked_chamfer(
    pred: jax.Array,
    pred_mask: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    chunk_a: int = 4096,
    chunk_b: int = 65536,
) -> jax.Array:
    """Static-shape Chamfer for in-graph use: (pred, gt) padded with masks.

    Shares one implementation with the F-score (the extra threshold
    reductions are negligible next to the O(N*M) NN passes)."""
    cd, _ = masked_chamfer_fscore(
        pred, pred_mask, gt, gt_mask, jnp.float32(1.0), chunk_a, chunk_b
    )
    return cd


@partial(jax.jit, static_argnames=("chunk_a", "chunk_b"))
def masked_chamfer_fscore(
    pred: jax.Array,
    pred_mask: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    tau: jax.Array,
    chunk_a: int = 4096,
    chunk_b: int = 65536,
):
    """Chamfer + F-score@tau from ONE pair of nearest-neighbor passes.

    F-score is the standard point-cloud metric the RaLD paper reports (the
    reference code computes only Chamfer, utils/utils.py:116-142): precision
    = fraction of predicted points within ``tau`` of GT, recall = fraction
    of GT points within ``tau`` of the prediction, F = 2PR/(P+R) (0 when an
    empty prediction makes both vacuous).
    """
    pred_valid = jnp.where(pred_mask[:, None], pred, _BIG)
    gt_valid = jnp.where(gt_mask[:, None], gt, _BIG)
    d_pg = nearest_neighbor_dists(pred, gt_valid, chunk_a, chunk_b)
    d_gp = nearest_neighbor_dists(gt, pred_valid, chunk_a, chunk_b)
    n_pred = jnp.maximum(jnp.sum(pred_mask), 1)
    n_gt = jnp.maximum(jnp.sum(gt_mask), 1)
    mean_pg = jnp.sum(jnp.where(pred_mask, d_pg, 0.0)) / n_pred
    mean_gp = jnp.sum(jnp.where(gt_mask, d_gp, 0.0)) / n_gt
    cd = 0.5 * mean_pg + 0.5 * mean_gp
    precision = jnp.sum(jnp.where(pred_mask, (d_pg < tau).astype(jnp.float32), 0.0)) / n_pred
    recall = jnp.sum(jnp.where(gt_mask, (d_gp < tau).astype(jnp.float32), 0.0)) / n_gt
    f = jnp.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)
    empty = jnp.sum(pred_mask) == 0
    return jnp.where(empty, jnp.inf, cd), jnp.where(empty, 0.0, f)


def _pad_pow2(pred: np.ndarray, gt: np.ndarray):
    # pad to powers of two to bound the number of jit specializations
    cap_p = max(8, 1 << (len(pred) - 1).bit_length())
    cap_g = max(8, 1 << (len(gt) - 1).bit_length())
    pred_pad = np.full((cap_p, 3), _BIG, np.float32)
    pred_pad[: len(pred)] = pred
    gt_pad = np.full((cap_g, 3), _BIG, np.float32)
    gt_pad[: len(gt)] = gt
    mask_p = np.arange(cap_p) < len(pred)
    mask_g = np.arange(cap_g) < len(gt)
    return pred_pad, mask_p, gt_pad, mask_g


def chamfer_distance(pred: np.ndarray, gt: np.ndarray) -> float:
    """Host API matching ``cal_metrics`` (utils/utils.py:116-137)."""
    pred = np.asarray(pred, np.float32).reshape(-1, 3)
    gt = np.asarray(gt, np.float32).reshape(-1, 3)
    if len(pred) == 0:
        return float("inf")
    return float(masked_chamfer(*_pad_pow2(pred, gt)))


def chamfer_and_fscore(pred: np.ndarray, gt: np.ndarray, tau: float) -> tuple:
    """Host API: (Chamfer, F-score@tau) for ragged clouds, one NN pass each way."""
    pred = np.asarray(pred, np.float32).reshape(-1, 3)
    gt = np.asarray(gt, np.float32).reshape(-1, 3)
    if len(pred) == 0:
        return float("inf"), 0.0
    cd, f = masked_chamfer_fscore(*_pad_pow2(pred, gt), jnp.float32(tau))
    return float(cd), float(f)


def batched_cd_fscore_graph(pred, pred_mask, gt, gt_mask, tau, use_pallas):
    """(B, P, 3)/(B, P) + (B, G, 3)/(B, G) -> ((B,) Chamfer, (B,) F-score).

    Traceable body shared by the host wrapper below and the engines' fused
    in-graph eval step. On TPU the NN passes run through the Pallas
    min-distance kernel (rald_tpu.ops.nn_dist_kernel — VMEM-tiled, no (P, G)
    matrix in HBM); elsewhere the vmapped scan formulation."""
    from rald_tpu.ops.nn_dist_kernel import nn_min_sq_both

    pred_valid = jnp.where(pred_mask[..., None], pred, _BIG)
    gt_valid = jnp.where(gt_mask[..., None], gt, _BIG)
    if use_pallas:
        # ONE sweep of the (P, G) distance blocks yields both directions
        # (row min + col min) — the distance computation is the dominant
        # VPU cost, and two independent passes would form it twice
        d2_pg, d2_gp = nn_min_sq_both(pred_valid, gt_valid)
        d_pg = jnp.sqrt(jnp.maximum(d2_pg, 0.0))
        d_gp = jnp.sqrt(jnp.maximum(d2_gp, 0.0))
    else:
        d_pg = jax.vmap(nearest_neighbor_dists)(pred_valid, gt_valid)
        d_gp = jax.vmap(nearest_neighbor_dists)(gt_valid, pred_valid)
    pm = pred_mask.astype(jnp.float32)
    gm = gt_mask.astype(jnp.float32)
    n_pred = jnp.maximum(jnp.sum(pm, axis=1), 1.0)
    n_gt = jnp.maximum(jnp.sum(gm, axis=1), 1.0)
    mean_pg = jnp.sum(d_pg * pm, axis=1) / n_pred
    mean_gp = jnp.sum(d_gp * gm, axis=1) / n_gt
    cd = 0.5 * mean_pg + 0.5 * mean_gp
    precision = jnp.sum((d_pg < tau).astype(jnp.float32) * pm, axis=1) / n_pred
    recall = jnp.sum((d_gp < tau).astype(jnp.float32) * gm, axis=1) / n_gt
    f = jnp.where(
        precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0
    )
    empty = jnp.sum(pm, axis=1) == 0
    return jnp.where(empty, jnp.inf, cd), jnp.where(empty, 0.0, f)


@partial(jax.jit, static_argnames=("use_pallas",))
def _batched_cd_fscore(pred, pred_mask, gt, gt_mask, tau, use_pallas):
    return batched_cd_fscore_graph(pred, pred_mask, gt, gt_mask, tau, use_pallas)


def chamfer_and_fscore_batch(preds: list, gts: list, tau: float) -> tuple:
    """Host API: per-frame (Chamfer, F-score@tau) for a whole eval batch in
    ONE device dispatch (the per-frame variant costs a dispatch + sync each,
    ~30 ms of tunnel overhead per frame on this hardware).

    Frames share power-of-two pad caps (the max over the batch), so the
    number of compiled programs stays bounded by the bucket pair like the
    per-frame path. Empty predictions keep the reference semantics
    (utils/utils.py:116-137): CD inf, F-score 0.
    """
    bsz = len(preds)
    assert bsz == len(gts)
    preds = [np.asarray(p, np.float32).reshape(-1, 3) for p in preds]
    gts = [np.asarray(g, np.float32).reshape(-1, 3) for g in gts]
    cap_p = max(8, 1 << (max(max(len(p) for p in preds), 1) - 1).bit_length())
    cap_g = max(8, 1 << (max(max(len(g) for g in gts), 1) - 1).bit_length())
    pred_pad = np.full((bsz, cap_p, 3), _BIG, np.float32)
    gt_pad = np.full((bsz, cap_g, 3), _BIG, np.float32)
    pmask = np.zeros((bsz, cap_p), bool)
    gmask = np.zeros((bsz, cap_g), bool)
    for i, (p, g) in enumerate(zip(preds, gts)):
        pred_pad[i, : len(p)] = p
        gt_pad[i, : len(g)] = g
        pmask[i, : len(p)] = True
        gmask[i, : len(g)] = True
    cd, f = _batched_cd_fscore(
        pred_pad, pmask, gt_pad, gmask, jnp.float32(tau),
        use_pallas=jax.default_backend() == "tpu",
    )
    cd, f = np.asarray(cd), np.asarray(f)
    return cd.tolist(), f.tolist()
