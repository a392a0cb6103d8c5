"""Fully-fused folded occupancy decode as a Pallas TPU kernel.

After the decode-tail fold (see ``VecSetVAE._decode_queries_folded``) the
per-query chain is:

    pts -> Fourier point-embed -> LayerNorm -> q-proj -> scores vs M latent
    keys -> softmax -> dot with the folded (M,) value vector -> logit

Under XLA each stage round-trips a (B, chunk, 512) tensor through HBM
(~4 KB/query); measured ~27% MXU utilization at batch 8 x 500k queries.
This kernel keeps the whole chain in VMEM per (batch, query-block) grid
step: HBM traffic is the query coordinates in (32 B padded) and one f32
logit out.

Math notes:
- The Fourier embed ``[sin(p B), cos(p B), p] @ W1`` is reshaped into three
  MXU-friendly matmuls with zero-padded weights: ``sin(P) W1s + cos(P) W1c +
  p Wxyz`` where P = p @ B_pad (lane-128). cos(0)=1 on padding columns is
  harmless because the corresponding W1c rows are zero.
- The occupancy head bias is folded INTO the value vector: softmax rows sum
  to 1, so ``p @ (v + b) == p @ v + b``.
- Queries are passed transposed (B, 8, Q) (coordinate rows zero-padded 3->8)
  so the lane dimension is the query axis.

Matches the reference chain models_ae.py:417-424 exactly (same reassociated
algebra as the unfused folded path). Inference-only.

MEASURED VERDICT (v5e, batch 8/16 x 500k queries, scripts/perf_probe5.py):
~10% SLOWER than the XLA folded path (90.3 vs 82.3 ms at batch 8; 144.6 vs
129.9 at batch 16; larger blocks worse), despite ~8x less HBM traffic —
XLA's single (B*chunk, 512) matmuls pipeline the MXU better than this
kernel's per-(batch, block) grid steps, so the decode is not HBM-bound
after the tail fold. Kept in-tree (differential-tested, exact) for shape
regimes with much larger M where score tensors dominate; default off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUB = 512  # queries per in-kernel sub-block (bounds live f32 VMEM buffers)


def _kernel(qT_ref, basis_ref, w1s_ref, w1c_ref, wxyz_ref, b1_ref, g_ref, be_ref,
            wq_ref, k_ref, vf_ref, o_ref, *, scale: float, ln_eps: float, dtype):
    blk = qT_ref.shape[-1]
    cd = (((0,), (0,)), ((), ()))  # contract the coordinate axis
    rows_per_sub = _SUB // (blk // 8)
    for sub in range(blk // _SUB):  # sequential sub-blocks: caps VMEM at ~_SUB rows
        ptsT = qT_ref[0, :, sub * _SUB : (sub + 1) * _SUB].astype(jnp.float32)  # (8, SUB)
        P = jax.lax.dot_general(ptsT, basis_ref[...], cd, preferred_element_type=jnp.float32)
        # (SUB, 128): Fourier phases, zero on padding columns
        emb = (
            jnp.dot(jnp.sin(P), w1s_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(jnp.cos(P), w1c_ref[...], preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ptsT, wxyz_ref[...], cd, preferred_element_type=jnp.float32)
            + b1_ref[...]
        )  # (SUB, D) point embedding in f32
        m = jnp.mean(emb, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(emb), axis=-1, keepdims=True) - jnp.square(m)
        h = (emb - m) * jax.lax.rsqrt(v + ln_eps) * g_ref[...] + be_ref[...]
        q = jnp.dot(h.astype(dtype), wq_ref[...], preferred_element_type=jnp.float32)
        s = jax.lax.dot_general(
            q.astype(dtype), k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (SUB, M)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        logit = jnp.sum(p * vf_ref[0], axis=-1)  # (SUB,) folded values (+ bias inside)
        # Mosaic requires the last two output-block dims to be (8k, 128k):
        # write each sub-block as consecutive rows of the (8, blk//8) tile
        # (row-major = query order)
        o_ref[0, 0, sub * rows_per_sub : (sub + 1) * rows_per_sub] = logit.reshape(
            rows_per_sub, blk // 8
        )


@functools.partial(jax.jit, static_argnames=("block", "ln_eps", "interpret"))
def fused_fold_decode(
    queries: jax.Array,   # (B, Q, 3)
    basis: jax.Array,     # (3, F) Fourier basis
    w1: jax.Array,        # (2F+3, D) point-embed mlp kernel
    b1: jax.Array,        # (D,)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,   # (D,)
    wq: jax.Array,        # (D, D)
    k: jax.Array,         # (B, M, D) latent keys
    v_fold: jax.Array,    # (B, M) folded values WITH the head bias added
    block: int = 1024,
    ln_eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Occupancy logits (B, Q) for the folded decode chain, fused in VMEM.

    ``block`` must be a multiple of 1024 (the result tile is (8, block//8)).
    """
    assert block % 1024 == 0, block
    b, nq, _ = queries.shape
    f = basis.shape[1]
    d = wq.shape[0]
    m = k.shape[1]
    dtype = k.dtype

    fpad = 128 * (-(-f // 128))
    basis_pad = jnp.zeros((8, fpad), jnp.float32).at[:3, :f].set(basis.astype(jnp.float32))
    w1 = w1.astype(jnp.float32)
    w1s = jnp.zeros((fpad, d), jnp.float32).at[:f].set(w1[:f])
    w1c = jnp.zeros((fpad, d), jnp.float32).at[:f].set(w1[f : 2 * f])
    wxyz = jnp.zeros((8, d), jnp.float32).at[:3].set(w1[2 * f :])

    nb = -(-nq // block)
    pad = nb * block - nq
    qT = jnp.swapaxes(queries.astype(jnp.float32), 1, 2)  # (B, 3, Q)
    qT = jnp.pad(qT, ((0, 0), (0, 5), (0, pad)))  # (B, 8, Q_pad)

    kernel = functools.partial(
        _kernel, scale=float(d) ** -0.5, ln_eps=ln_eps, dtype=dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 8, block), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fpad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fpad, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fpad, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, block // 8), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nb, 8, block // 8), jnp.float32),
        interpret=interpret,
    )(
        qT, basis_pad, w1s, w1c, wxyz,
        b1.astype(jnp.float32).reshape(1, d),
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        wq.astype(dtype),
        k.astype(dtype),
        v_fold.astype(jnp.float32).reshape(b, 1, m),
    )
    return out.reshape(b, nb * block)[:, :nq]
