"""Pallas TPU kernel: fused occupancy-decode tail.

The inference hot loop decodes 0.5-1.2M query points against 512 latent
tokens (reference ``models_ae.py:417-424`` run at ``engine_generation.py:
250-310``). The XLA path (:mod:`rald_tpu.ops.query_attention`) streams query
chunks but still round-trips every intermediate — point embedding, layernorm,
q-projection, attention output — through HBM: ~5 tensors x Q x 512 of
traffic. This kernel fuses the whole per-query pipeline in VMEM:

    queries (TQ, 3)
      -> Fourier point embedding (sin/cos of q @ basis, concat q)
      -> Dense 51 -> 512 (+bias)                       [point_embed.mlp]
      -> LayerNorm                                      [dec_norm_q]
      -> q = x @ Wq (512 -> 512, no bias)               [dec_cross_attn.to_q]
      -> softmax(q K^T / sqrt(512)) V   (K,V: 512x512, resident in VMEM)
      -> out = o @ Wo + bo (512 -> 512)                 [dec_cross_attn.to_out]
      -> logit = out @ Wh + bh (512 -> 1)               [to_outputs]

Grid: (batch, Q / TQ); K/V and all weights live in VMEM across the whole
row of query tiles (~2.6 MB of bf16 weights + 2x0.5 MB KV). One HBM read of
the queries and one write of the logits — everything else stays on-chip.

Matmuls accumulate in f32 (`preferred_element_type`); layernorm statistics
and the softmax run in f32. `interpret=True` makes the same kernel run on
CPU for differential tests.

MEASURED VERDICT (v5e-1, B=8 x 500k queries, bf16): XLA streamed path
90.4 ms vs this kernel 99.6 ms (tile 2048). XLA's automatic fusion already
keeps the chain's intermediates out of HBM well enough that the hand-fused
kernel buys nothing at these shapes — the default decode path therefore
stays on :mod:`rald_tpu.ops.query_attention`, and this kernel remains an
exact, tested alternative for future shape regimes (it wins when VMEM
pressure from other live tensors forces XLA to materialize the chain).
f32 needs tile_q <= 256 to fit scoped VMEM; use bf16.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rald_tpu.nn.layers import point_fourier_basis


def _decode_tail_kernel(
    q_ref,        # (1, TQ, 3) queries
    basis_ref,    # (8, HALF) fourier basis, padded rows (3 real)
    w_pe_ref,     # (EMB_PAD, D) point-embed kernel, zero-padded rows
    b_pe_ref,     # (1, D)
    ln_scale_ref, # (1, D)
    ln_bias_ref,  # (1, D)
    w_q_ref,      # (D, D)
    k_ref,        # (1, M, D)
    v_ref,        # (1, M, D)
    w_out_ref,    # (D, D)
    b_out_ref,    # (1, D)
    w_head_ref,   # (D, HEAD_PAD) zero-padded cols (1 real)
    b_head_ref,   # (1, HEAD_PAD)
    out_ref,      # (1, TQ//128, 128) — logits packed into (sublane, lane) tiles
):
    f32 = jnp.float32
    q3 = q_ref[0].astype(f32)                        # (TQ, 3)
    # fourier features: [sin(q3 @ B), cos(q3 @ B), q3] -> (TQ, 2*HALF + 3)
    proj = jax.lax.dot_general(
        q3, basis_ref[:3, :].astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    feats = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), q3], axis=-1)
    # zero-padded w_pe rows make the padded feature columns inert
    emb_in = feats.shape[-1]
    e = (
        jnp.dot(feats.astype(w_pe_ref.dtype), w_pe_ref[:emb_in, :],
                preferred_element_type=f32)
        + b_pe_ref[0].astype(f32)
    )
    # layernorm (f32 statistics)
    mu = jnp.mean(e, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(e - mu), axis=-1, keepdims=True)
    x = (e - mu) * jax.lax.rsqrt(var + 1e-5)
    x = x * ln_scale_ref[0].astype(f32) + ln_bias_ref[0].astype(f32)

    compute_dtype = w_q_ref.dtype
    q = jnp.dot(x.astype(compute_dtype), w_q_ref[...], preferred_element_type=f32)
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q.astype(compute_dtype), k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * (d ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.dot(probs.astype(compute_dtype), v_ref[0], preferred_element_type=f32)
    out = (
        jnp.dot(o.astype(compute_dtype), w_out_ref[...], preferred_element_type=f32)
        + b_out_ref[0].astype(f32)
    )
    logit = (
        jnp.dot(out.astype(compute_dtype), w_head_ref[...], preferred_element_type=f32)
        + b_head_ref[0].astype(f32)
    )
    # (TQ, HEAD_PAD) -> column 0 packed as (TQ//128, 128): the HBM write is
    # 1x the logical output (a HEAD_PAD-wide block would write 128x)
    tq = logit.shape[0]
    out_ref[0] = logit[:, 0].reshape(tq // 128, 128).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("tile_q", "interpret"),
)
def fused_decode_tail(
    queries: jax.Array,   # (B, Q, 3)
    basis: jax.Array,     # (3, HALF)
    w_pe: jax.Array,      # (2*HALF+3, D)
    b_pe: jax.Array,      # (D,)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,   # (D,)
    w_q: jax.Array,       # (D, D)
    k: jax.Array,         # (B, M, D)
    v: jax.Array,         # (B, M, D)
    w_out: jax.Array,     # (D, D)
    b_out: jax.Array,     # (D,)
    w_head: jax.Array,    # (D, 1)
    b_head: jax.Array,    # (1,)
    tile_q: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Occupancy logits (B, Q, 1) for the single-head decoder tail."""
    assert tile_q % 128 == 0, "tile_q must be a multiple of 128 (lane packing)"
    b, q_total, _ = queries.shape
    d = w_q.shape[0]
    emb_in = w_pe.shape[0]

    pad_q = (-q_total) % tile_q
    if pad_q:
        queries = jnp.pad(queries, ((0, 0), (0, pad_q), (0, 0)))
    q_padded = q_total + pad_q

    head_pad = 128  # lane-align the 1-logit head; extra cols are zeros
    w_head_p = jnp.zeros((d, head_pad), w_q.dtype).at[:, :1].set(w_head.astype(w_q.dtype))
    b_head_p = jnp.zeros((1, head_pad), jnp.float32).at[0, :1].set(b_head.astype(jnp.float32))
    basis_p = jnp.zeros((8, basis.shape[1]), jnp.float32).at[:3].set(basis.astype(jnp.float32))

    grid = (b, q_padded // tile_q)
    out = pl.pallas_call(
        _decode_tail_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, 3), lambda i, j: (i, j, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((8, basis.shape[1]), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((emb_in, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, k.shape[1], d), lambda i, j: (i, 0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, v.shape[1], d), lambda i, j: (i, 0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((d, head_pad), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, head_pad), lambda i, j: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q // 128, 128), lambda i, j: (i, j, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, q_padded // 128, 128), jnp.float32),
        interpret=interpret,
    )(
        queries,
        basis_p,
        w_pe,
        b_pe.reshape(1, -1),
        ln_scale.reshape(1, -1),
        ln_bias.reshape(1, -1),
        w_q,
        k,
        v,
        w_out,
        b_out.reshape(1, -1),
        w_head_p,
        b_head_p,
    )
    return out.reshape(b, q_padded)[:, :q_total, None]


def decode_tail_params(vae_variables: dict) -> dict:
    """Extract the kernel's weight set from VecSetVAE params (bound or raw)."""
    p = vae_variables["params"] if "params" in vae_variables else vae_variables
    return dict(
        basis=jnp.asarray(point_fourier_basis(48)),
        w_pe=p["point_embed"]["mlp"]["kernel"],
        b_pe=p["point_embed"]["mlp"]["bias"],
        ln_scale=p["dec_norm_q"]["scale"],
        ln_bias=p["dec_norm_q"]["bias"],
        w_q=p["dec_cross_attn"]["to_q"]["kernel"],
        w_out=p["dec_cross_attn"]["to_out"]["kernel"],
        b_out=p["dec_cross_attn"]["to_out"]["bias"],
        w_head=p["to_outputs"]["kernel"],
        b_head=p["to_outputs"]["bias"],
    )


def decode_tail_kv(vae, vae_params, tokens: jax.Array):
    """Precompute the (K, V) context the kernel attends to: LN + to_kv over
    the decoder token state (reference models_ae.py:417-418 context side)."""
    p = vae_params["params"] if "params" in vae_params else vae_params
    ln = p["dec_norm_ctx"]
    mu = jnp.mean(tokens.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(tokens.astype(jnp.float32), axis=-1, keepdims=True)
    ctx = (tokens.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
    ctx = ctx * ln["scale"] + ln["bias"]
    kv = ctx.astype(tokens.dtype) @ p["dec_cross_attn"]["to_kv"]["kernel"]
    k, v = jnp.split(kv, 2, axis=-1)
    return k, v
