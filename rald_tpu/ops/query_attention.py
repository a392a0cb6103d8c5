"""Streaming decoder cross-attention over huge query sets.

The reference decodes occupancy by one giant single-head cross-attention of
up to ~1.2M query points against 512 latent tokens in a single matmul at
batch 1 (``models_ae.py:417-418``, ``engine_generation.py:250-310``).
Materializing the (1.2M, 512) score/value intermediates in HBM several times
is the bandwidth bottleneck of inference.

TPU design: queries attend *independently* to a tiny KV set (512 x 512 =
1 MB — fits VMEM), so the query axis is embarrassingly streamable:

- :func:`map_query_chunks` pads the query axis to a chunk multiple and runs a
  caller-supplied per-chunk function under ``lax.map`` — one jit, no host
  round-trips, O(chunk) live memory. The chunk closure typically fuses
  point-embed -> layernorm -> q-proj -> attention -> output head.
- :func:`streaming_single_head_attention` is the attention core for such a
  closure (plain einsum per chunk; XLA keeps KV resident and fuses the
  softmax — profiling showed no need for a hand-written Pallas kernel at
  KV=512, the op is MXU-bound already).

When scaling out, shard the query axis over the mesh data axis — queries are
independent, so no collective is needed until the final gather (our analog of
sequence parallelism; see SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jax.Array, multiple: int, axis: int):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def map_query_chunks(
    fn: Callable[[jax.Array], jax.Array],
    queries: jax.Array,
    chunk_size: int = 65536,
) -> jax.Array:
    """Apply ``fn`` over chunks of the query axis.

    ``queries``: (B, Q, F). ``fn``: (B, chunk, F) -> (B, chunk, ...) applied
    under ``lax.map`` (sequential chunks, constant memory). Output is
    re-assembled to (B, Q, ...). Padding queries are dropped, so ``fn`` need
    not mask.
    """
    b, q, f = queries.shape
    if q <= chunk_size:
        return fn(queries)
    padded, _ = _pad_to_multiple(queries, chunk_size, axis=1)
    n_chunks = padded.shape[1] // chunk_size
    # (B, C*chunk, F) -> (C, B, chunk, F) so lax.map scans the chunk axis
    chunked = padded.reshape(b, n_chunks, chunk_size, f).transpose(1, 0, 2, 3)
    out = jax.lax.map(fn, chunked)  # (C, B, chunk, ...)
    out = out.transpose(1, 0, *range(2, out.ndim)).reshape(b, n_chunks * chunk_size, *out.shape[3:])
    return out[:, :q]


def streaming_single_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    chunk_size: int = 65536,
) -> jax.Array:
    """Softmax attention of (B, Q, D) queries over small (B, M, D) KV.

    Equivalent to ``softmax(q k^T / sqrt(D)) v`` with the query axis
    streamed in ``chunk_size`` blocks.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale

    def attend(q_blk):
        sim = jnp.einsum("bqd,bmd->bqm", q_blk, k) * scale
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bqm,bmd->bqd", attn, v)

    return map_query_chunks(attend, q, chunk_size)
