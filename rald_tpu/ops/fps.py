"""Farthest point sampling, TPU-native.

Replaces ``torch_cluster.fps`` (reference ``model/models_ae.py:11,358-374``):
select M of N points, each new pick maximizing its distance to the set picked
so far. The torch_cluster kernel is a sequential CUDA loop over ragged
batches; here batches are rectangular (fixed N per sample, guaranteed by the
input pipeline), so the TPU-native shape is a ``lax.fori_loop`` carrying a
running (N,)-vector of min-squared-distances (40 KB for N=10k — lives in
VMEM), ``vmap``-ed over the batch. Each iteration is one fused
distance-update + argmax on the VPU; there is no data-dependent shape
anywhere, so the whole (B, M, N) schedule compiles to a single XLA while
loop.

``start_idx`` pins the first pick (torch_cluster defaults to a random start;
pass a per-sample random index for that behavior, 0 for determinism).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_samples",))
def _fps_single(points: jax.Array, num_samples: int, start_idx: jax.Array) -> jax.Array:
    n = points.shape[0]
    pts = points.astype(jnp.float32)

    def body(i, state):
        min_d2, idxs, last = state
        d2 = jnp.sum((pts - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_d2, idxs, pts[nxt]

    min_d2 = jnp.full((n,), jnp.inf, dtype=jnp.float32)
    idxs = jnp.zeros((num_samples,), dtype=jnp.int32).at[0].set(start_idx)
    _, idxs, _ = jax.lax.fori_loop(1, num_samples, body, (min_d2, idxs, pts[start_idx]))
    return idxs


def farthest_point_sampling(
    points: jax.Array, num_samples: int, start_idx: jax.Array | int = 0
) -> jax.Array:
    """FPS indices for ``points`` of shape (N, 3) or (B, N, 3).

    Returns int32 indices of shape (num_samples,) or (B, num_samples).
    ``start_idx`` may be a scalar or per-batch (B,) array.
    """
    if points.ndim == 2:
        return _fps_single(points, num_samples, jnp.asarray(start_idx, jnp.int32))
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (points.shape[0],))
    return jax.vmap(lambda p, s: _fps_single(p, num_samples, s))(points, start)


def fps_points(points: jax.Array, num_samples: int, start_idx: jax.Array | int = 0) -> jax.Array:
    """Gather the FPS-selected points themselves ((B, N, 3) -> (B, M, 3))."""
    idx = farthest_point_sampling(points, num_samples, start_idx)
    if points.ndim == 2:
        return points[idx]
    return jnp.take_along_axis(points, idx[..., None], axis=1)
