"""Fused self-attention sublayer Pallas kernel for 512-token stacks.

The DiT / VAE self-attention sublayer is, per token batch b:

    y = x + Wo @ MHA(norm(x)) ,  norm = LayerNorm (+ optional AdaLN mod)

with 512 tokens, dim 512, 8 heads x 64. Under XLA the q/k/v projections,
the (H, 512, 512) score tensor, the softmax and the values matmul each
round-trip HBM (~90 MB per layer per NFE at batch 8) — roughly as much time
as the sublayer's FLOPs (tower measurements in scripts/perf_probe2.py).

This kernel runs the WHOLE sublayer per batch element in VMEM: one grid
step loads x (512x512 bf16, 0.5 MB) and the four weight matrices (2 MB,
VMEM-resident across the grid via constant index maps), computes LN(+mod),
q/k/v, all 8 heads' attention (f32 softmax), the out-projection and the
residual add, and writes only the (512, 512) result.

Status of the bf16 kernel (:func:`fused_self_attention_block`): kept
in-tree but DEFAULT-OFF — no engine or config sets ``use_fused_attn``;
measured NEUTRAL vs XLA's fusion at these shapes (docs/DESIGN.md "dead
ends": XLA attention is already near its HBM floor here), exercised by
scripts/perf_probe3.py and tests/test_fused_kernels.py only. The int8
variants below are NOT dead-off: ``eval.inference.int8_attn`` ("full" or
"vout") routes the DiT through them for quantized inference, and bench.py's
documented operating point uses the "vout" kernel (int8 buys back the MXU
time the bf16 fusion could not). Inference-only (no autodiff rule).
AdaLN ``mod`` inputs must be
(B, 1, D)-broadcastable — validated in the wrapper below. The reference
computes the same math as separate torch ops
(models_radar_generation.py:133-169, models_ae.py:412-414).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rald_tpu.ops._mxu import mxu_dot, mxu_dot_general


def _kernel(x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, ln_eps: float, scale_shift_mod: bool):
    x = x_ref[0]  # (N, D) bf16
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    h = (xf - m) * jax.lax.rsqrt(var + ln_eps)
    s_row = s_ref[0].astype(jnp.float32)  # (1, D)
    b_row = b_ref[0].astype(jnp.float32)
    if scale_shift_mod:
        h = h * (1.0 + s_row) + b_row
    else:
        # plain LayerNorm with learned scale/bias (VAE blocks)
        h = h * s_row + b_row
    h = h.astype(x.dtype)

    q = mxu_dot(h, wq_ref[...], jnp.float32).astype(x.dtype)
    k = mxu_dot(h, wk_ref[...], jnp.float32).astype(x.dtype)
    v = mxu_dot(h, wv_ref[...], jnp.float32).astype(x.dtype)

    n, d = x.shape
    dh = d // heads
    outs = []
    for hd in range(heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = mxu_dot_general(qh, kh, (((1,), (1,)), ((), ())), jnp.float32) * (dh ** -0.5)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(mxu_dot(a, vh, jnp.float32).astype(x.dtype))
    attn_out = jnp.concatenate(outs, axis=-1)

    y = mxu_dot(attn_out, wo_ref[...], jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32) + xf  # residual
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "ln_eps", "scale_shift_mod", "interpret")
)
def fused_self_attention_block(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    heads: int = 8,
    ln_eps: float = 1e-5,
    scale_shift_mod: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """``x + Wo @ MHA(mod(LN(x)))`` fused per batch element.

    x: (B, N, D); scale/shift: (B, N or 1, D) AdaLN modulation
    (``scale_shift_mod=True``: ``h*(1+scale)+shift``) or broadcastable
    LayerNorm scale/bias (``False``: ``h*scale+shift``); wq/wk/wv/wo:
    (D, D); bo: (D,). N and D must be 128-aligned; D == heads * head_dim.
    """
    b, n, d = x.shape
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] not in (1,):
            raise ValueError(
                f"fused_self_attention_block: {name} must be (B, 1, D)-"
                f"broadcastable (one modulation row per batch element), got "
                f"{a.shape} — per-token modulations are not supported"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (b, 1, d)).reshape(b, 1, d)
    shift = jnp.broadcast_to(shift.astype(x.dtype), (b, 1, d)).reshape(b, 1, d)
    wq, wk, wv, wo, bo = (a.astype(x.dtype) for a in (wq, wk, wv, wo, bo))

    kernel = functools.partial(
        _kernel, heads=heads, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(x, scale, shift, wq, wk, wv, wo, bo.reshape(1, -1))


def _int8_kernel(x_ref, s_ref, b_ref, wq_ref, sq_ref, wk_ref, sk_ref,
                 wv_ref, sv_ref, wo_ref, so_ref, bo_ref, o_ref,
                 *, heads: int, ln_eps: float, scale_shift_mod: bool):
    """int8-projection variant of :func:`_kernel` (round-3 quantized
    inference): the four (D, D) projection matmuls run int8 x int8 -> int32
    on the MXU's double-rate 8-bit mode. The LN output is quantized per-row
    ONCE and shared by the q/k/v dots; attention scores, softmax and the
    attention-weighted values stay in f32/bf16 exactly as the bf16 kernel.
    """
    x = x_ref[0]  # (N, D)
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    h = (xf - m) * jax.lax.rsqrt(var + ln_eps)
    s_row = s_ref[0].astype(jnp.float32)
    b_row = b_ref[0].astype(jnp.float32)
    if scale_shift_mod:
        h = h * (1.0 + s_row) + b_row
    else:
        h = h * s_row + b_row

    hmax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
    hq8 = jnp.round(h * (127.0 / hmax)).astype(jnp.int8)
    hrow = hmax / 127.0  # (N, 1)

    def proj(wq8_ref, scol_ref):
        acc = mxu_dot(hq8, wq8_ref[...], jnp.int32)
        return (acc.astype(jnp.float32) * hrow * scol_ref[...]).astype(x.dtype)

    q = proj(wq_ref, sq_ref)
    k = proj(wk_ref, sk_ref)
    v = proj(wv_ref, sv_ref)

    n, d = x.shape
    dh = d // heads
    outs = []
    for hd in range(heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = mxu_dot_general(qh, kh, (((1,), (1,)), ((), ())), jnp.float32) * (dh ** -0.5)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(mxu_dot(a, vh, jnp.float32))
    attn_out = jnp.concatenate(outs, axis=-1)  # f32

    amax = jnp.maximum(jnp.max(jnp.abs(attn_out), axis=-1, keepdims=True), 1e-6)
    aq8 = jnp.round(attn_out * (127.0 / amax)).astype(jnp.int8)
    acc = mxu_dot(aq8, wo_ref[...], jnp.int32)
    y = acc.astype(jnp.float32) * (amax / 127.0) * so_ref[...]
    y = y + bo_ref[...].astype(jnp.float32) + xf  # residual
    o_ref[0] = y.astype(o_ref.dtype)


def quantize_attn_tree(params) -> dict:
    """Mirror ``"int8"`` collection for self-attention projections: every
    ``attn1`` node carrying ``to_q/to_k/to_v/to_out`` Dense kernels gains
    per-output-column int8 weights + f32 scales at the same tree path.
    Compose with ops.geglu_kernel.quantize_ff_tree via a dict merge.
    (Cross-attention ``attn2`` is deliberately NOT quantized: a fused
    int8-out cross-attn kernel measured slower than XLA's einsum path —
    docs/DESIGN.md round 3.)"""
    from rald_tpu.ops.geglu_kernel import quantize_cols

    def walk(d):
        out = {}
        for k, v in d.items():
            if not isinstance(v, dict):
                continue
            if k == "attn1" and all(
                key in v for key in ("to_q", "to_k", "to_v", "to_out")
            ):
                node = {}
                for proj in ("to_q", "to_k", "to_v", "to_out"):
                    wq8, s = quantize_cols(v[proj]["kernel"])
                    node[proj + "_q"] = wq8
                    node[proj + "_s"] = s
                out[k] = node
            else:
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return walk(params)


def merge_int8_trees(a: dict, b: dict) -> dict:
    """Deep-merge two ``"int8"`` collections (disjoint leaves)."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_int8_trees(out[k], v)
        else:
            out[k] = v
    return out


@functools.partial(
    jax.jit, static_argnames=("heads", "ln_eps", "scale_shift_mod", "interpret")
)
def fused_self_attention_block_int8(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    wq_q: jax.Array, wq_s: jax.Array,
    wk_q: jax.Array, wk_s: jax.Array,
    wv_q: jax.Array, wv_s: jax.Array,
    wo_q: jax.Array, wo_s: jax.Array,
    bo: jax.Array,
    heads: int = 8,
    ln_eps: float = 1e-5,
    scale_shift_mod: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fused_self_attention_block` with int8 projection weights
    (from :func:`quantize_attn_tree`) + dynamic per-token activation
    quantization. Lossy; opt-in via ``use_int8_attn`` (quantized
    inference), e2e-gated by scripts/perf_probe4.py."""
    b, n, d = x.shape
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] not in (1,):
            raise ValueError(
                f"fused_self_attention_block_int8: {name} must be (B, 1, D)-"
                f"broadcastable, got {a.shape}"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (b, 1, d))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (b, 1, d))

    kernel = functools.partial(
        _int8_kernel, heads=heads, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    wspec = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            wspec, sspec, wspec, sspec, wspec, sspec, wspec, sspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(x, scale, shift, wq_q, wq_s, wk_q, wk_s, wv_q, wv_s, wo_q, wo_s,
      bo.reshape(1, -1))


def _int8_vout_kernel(x_ref, s_ref, b_ref, wq_ref, wk_ref,
                      wv_ref, sv_ref, wo_ref, so_ref, bo_ref, o_ref,
                      *, heads: int, ln_eps: float, scale_shift_mod: bool):
    """Milder quantization: q/k projections stay bf16 (their error passes
    through the softmax nonlinearly), only the v and out projections run
    int8 (their error stays linear through the attention average)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    h = (xf - m) * jax.lax.rsqrt(var + ln_eps)
    s_row = s_ref[0].astype(jnp.float32)
    b_row = b_ref[0].astype(jnp.float32)
    if scale_shift_mod:
        h = h * (1.0 + s_row) + b_row
    else:
        h = h * s_row + b_row

    hb = h.astype(x.dtype)
    q = mxu_dot(hb, wq_ref[...], jnp.float32).astype(x.dtype)
    k = mxu_dot(hb, wk_ref[...], jnp.float32).astype(x.dtype)

    hmax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
    hq8 = jnp.round(h * (127.0 / hmax)).astype(jnp.int8)
    acc = mxu_dot(hq8, wv_ref[...], jnp.int32)
    v = (acc.astype(jnp.float32) * (hmax / 127.0) * sv_ref[...]).astype(x.dtype)

    n, d = x.shape
    dh = d // heads
    outs = []
    for hd in range(heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = mxu_dot_general(qh, kh, (((1,), (1,)), ((), ())), jnp.float32) * (dh ** -0.5)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(mxu_dot(a, vh, jnp.float32))
    attn_out = jnp.concatenate(outs, axis=-1)

    amax = jnp.maximum(jnp.max(jnp.abs(attn_out), axis=-1, keepdims=True), 1e-6)
    aq8 = jnp.round(attn_out * (127.0 / amax)).astype(jnp.int8)
    acc = mxu_dot(aq8, wo_ref[...], jnp.int32)
    y = acc.astype(jnp.float32) * (amax / 127.0) * so_ref[...]
    y = y + bo_ref[...].astype(jnp.float32) + xf
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "ln_eps", "scale_shift_mod", "interpret")
)
def fused_self_attention_block_int8_vout(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv_q: jax.Array, wv_s: jax.Array,
    wo_q: jax.Array, wo_s: jax.Array,
    bo: jax.Array,
    heads: int = 8,
    ln_eps: float = 1e-5,
    scale_shift_mod: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fused_self_attention_block_int8` but with bf16 q/k projections
    (``eval.inference.int8_attn: "vout"``) — half the int8 speedup, but the
    quantization error stays linear (no softmax amplification)."""
    b, n, d = x.shape
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] not in (1,):
            raise ValueError(
                f"fused_self_attention_block_int8_vout: {name} must be "
                f"(B, 1, D)-broadcastable, got {a.shape}"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (b, 1, d))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (b, 1, d))
    wq = wq.astype(x.dtype)
    wk = wk.astype(x.dtype)

    kernel = functools.partial(
        _int8_vout_kernel, heads=heads, ln_eps=ln_eps,
        scale_shift_mod=scale_shift_mod,
    )
    wspec = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            wspec, wspec, wspec, sspec, wspec, sspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(x, scale, shift, wq, wk, wv_q, wv_s, wo_q, wo_s, bo.reshape(1, -1))
