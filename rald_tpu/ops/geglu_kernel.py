"""Fused GEGLU feed-forward Pallas kernel.

The DiT / VAE transformer blocks' FF is ``x @ W1 -> split -> h * gelu(g) ->
@ W2`` with ``dim=512``, ``inner=2048`` (reference models_ae.py:56-68,
models_radar_generation.py:88-117). Under XLA the (tokens, 4096) projection
output and the (tokens, 2048) gated product round-trip HBM between the two
matmuls — at batch 8 x 512 tokens that is ~100 MB per layer per NFE, the
single largest activation stream of the 35-NFE sampler.

This kernel tiles the token axis and keeps the wide intermediates in VMEM:
per grid step it computes ``(block, dim) @ (dim, 2*inner)`` on the MXU,
applies the GEGLU gate on the VPU, and immediately contracts with
``(inner, dim)`` — the only HBM traffic is x, W1, W2, bias and the (block,
dim) result. Weights (512x4096 + 2048x512 bf16 = 6 MB) stay VMEM-resident
across the whole token range via a constant index_map.

Exact-erf GELU to match torch F.gelu (checkpoint parity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rald_tpu.ops._mxu import mxu_dot, mxu_dot_general


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7.

    Pallas TPU has no erf/erfc lowering; 1.5e-7 is ~4 orders of magnitude
    below bf16 resolution (2^-8), so the fused FF matches the unfused
    exact-erf GELU path bit-for-bit after the bf16 round.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


# erf(x) ~= clamp(x, -3, 3) * P(x^2): IRLS-minimax fit on [0, 3] with the
# endpoint CONSTRAINED to x*P(x^2) = 1 at x = 3, degree-15 odd polynomial
# (8 coefficients in x^2, 7 Horner FMAs, no exp, no divide, no extra
# saturation ops — the input clamp alone saturates the output). The linear
# coefficient is then nudged so the f32 Horner evaluates to 1 - 1ulp
# (0.99999994) at the endpoint. Measured (tests/test_fused_kernels.py):
# max |erf error| 9.3e-5 in-range; beyond |x|=3 the output is sign(x) to
# within 6e-8, so the erf error there is <= 1 - erf(3) = 2.2e-5 and decays,
# and the GELU tail for large-negative gates is ~3e-8*|x| (an earlier
# unconstrained fit saturated at 0.99972, leaking a 1.4e-4*|x| tail). All
# ~80x below the int8 path's own per-token quantization noise (~8e-3 rel),
# and the erf input is a *gate*, so the error enters multiplicatively on an
# O(1) factor. Fit: constrained least squares (KKT) + IRLS reweighting
# toward minimax + f32 endpoint nudge; recorded in docs/DESIGN.md round 4.
_ERF_POLY = (
    1.1278664111e+00, -3.7308188663e-01, 1.0751176122e-01, -2.2562818144e-02,
    3.2815626959e-03, -3.0865364415e-04, 1.6680301565e-05, -3.9017459733e-07,
)


def _erf_poly(x):
    # clamp the INPUT to the fit range: the polynomial diverges beyond it,
    # and the endpoint is pinned to 1.0 (to 1 f32 ulp) by construction, so
    # the clamp IS the saturation — no extra select on the VPU chain.
    x = jnp.clip(x, -3.0, 3.0)
    x2 = x * x
    p = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        p = p * x2 + jnp.float32(c)
    return x * p


def _gelu_poly(x):
    """Transcendental-free GELU for the (already lossy) int8 kernels.

    The A&S rational erf costs an exp + divide per element on the
    (rows, 2048) gate — measured 0.663 -> 0.560 ms per batch-32 FF sublayer
    when replaced with the clamped odd polynomial (scripts/perf_probe6c.py;
    the VPU chain is additive with the MXU at these shapes, perf_probe6b).
    Kept OUT of the bf16 kernels, whose exact-erf GELU is part of the
    checkpoint-parity contract.
    """
    return x * (0.5 * (1.0 + _erf_poly(x * 0.7071067811865476)))


def _ln_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, ln_eps: float, scale_shift_mod: bool):
    """Whole FF sublayer per (batch, token-block) grid step:

        out = x + W2 @ geglu(W1 @ mod(LN(x)))

    with mod(h) = h*(1+s)+b (AdaLN, ``scale_shift_mod=True``) or h*s+b
    (affine LayerNorm params, ``False``). The LN output, the modulated
    activations, the (block, 2*inner) projection and the gated product all
    stay in VMEM — HBM sees only x (read once, reused for the residual),
    the weights, and the (block, dim) result.
    """
    x = x_ref[0]  # (block, D)
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    h = (xf - m) * jax.lax.rsqrt(var + ln_eps)
    s_row = s_ref[0].astype(jnp.float32)  # (1, D)
    b_row = b_ref[0].astype(jnp.float32)
    if scale_shift_mod:
        h = h * (1.0 + s_row) + b_row
    else:
        h = h * s_row + b_row
    h = h.astype(x.dtype)

    p = mxu_dot(h, w1_ref[...], jnp.float32)
    p = (p + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    inner = p.shape[-1] // 2
    val, gate = p[:, :inner], p[:, inner:]
    g = val * _gelu_exact(gate)
    out = mxu_dot(g, w2_ref[...], jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32) + xf  # residual
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale_shift_mod", "ln_eps", "block", "interpret")
)
def fused_ln_geglu_residual(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    scale_shift_mod: bool = True,
    ln_eps: float = 1e-5,
    block: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """``x + (proj_in -> GEGLU -> proj_out)(mod(LN(x)))`` fused in VMEM.

    x: (B, N, D); scale/shift: (B, 1, D)-broadcastable modulation rows
    (AdaLN ``h*(1+scale)+shift`` when ``scale_shift_mod``, else affine
    ``h*scale+shift``); w1: (D, 2*inner); w2: (inner, D) — the FF must be
    dim-preserving for the residual. Per-token modulations are not
    supported (one row per batch element). Inference-path only.

    ``block`` (row tile) 0 = auto: 512 for <=2-byte activations, 256 for
    f32 — the (block, 2*inner) projection intermediate at block 512 under
    f32 exceeds the 16 MB scoped-VMEM stack (measured 16.21M compiling the
    strict-parity ``matmul_precision: highest`` + ``compute_dtype:
    float32`` configuration on v5e).
    """
    if not block:
        block = 512 if jnp.dtype(x.dtype).itemsize <= 2 else 256
    bsz, n, dim = x.shape
    assert w2.shape[-1] == dim, "residual fusion needs out_dim == dim"
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] != 1:
            raise ValueError(
                f"fused_ln_geglu_residual: {name} must be (B, 1, D)-"
                f"broadcastable, got {a.shape}"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (bsz, 1, dim))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (bsz, 1, dim))
    two_inner = w1.shape[-1]
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    kernel = functools.partial(
        _ln_kernel, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nb * block, dim), x.dtype),
        interpret=interpret,
    )(x, scale, shift, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    if pad:
        out = out[:, :n]
    return out


def _ln_int8_kernel(x_ref, s_ref, b_ref, w1q_ref, s1_ref, b1_ref,
                    w2q_ref, s2_ref, b2_ref, o_ref,
                    *, ln_eps: float, scale_shift_mod: bool):
    """int8-weight variant of :func:`_ln_kernel` (round-3 lever, measured
    0.415 -> 0.344 ms per (16,512,512)x2048 FF sublayer on v5e —
    scripts/perf_probe4.py).

    Weights are pre-quantized per-output-column (symmetric int8);
    activations are quantized per-row (per-token) dynamically after the
    LN+mod, so both MXU contractions run int8 x int8 -> int32 at the MXU's
    double-rate 8-bit mode. Dequantization is the rank-1 outer product of
    the row and column scales; the GEGLU gate runs in f32 via the
    transcendental-free :func:`_gelu_poly` (a further -15% on this kernel,
    scripts/perf_probe6c.py — the VPU chain is additive with the MXU here,
    so every VPU op is on the critical path).
    """
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

    hmax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
    hq = jnp.round(h * (127.0 / hmax)).astype(jnp.int8)
    acc = mxu_dot(hq, w1q_ref[...], jnp.int32)
    p = acc.astype(jnp.float32) * (hmax / 127.0) * s1_ref[...]
    p = p + b1_ref[...].astype(jnp.float32)
    inner = p.shape[-1] // 2
    val, gate = p[:, :inner], p[:, inner:]
    g = val * _gelu_poly(gate)

    gmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-6)
    gq = jnp.round(g * (127.0 / gmax)).astype(jnp.int8)
    acc2 = mxu_dot(gq, w2q_ref[...], jnp.int32)
    out = acc2.astype(jnp.float32) * (gmax / 127.0) * s2_ref[...]
    out = out + b2_ref[...].astype(jnp.float32) + xf
    o_ref[0] = out.astype(o_ref.dtype)


def _ln_int8_static_kernel(x_ref, s_ref, b_ref, w1q_ref, d1_ref, b1_ref,
                           w2q_ref, d2_ref, b2_ref, ih_ref, ig_ref, o_ref,
                           *, ln_eps: float, scale_shift_mod: bool):
    """Static-activation-scale variant of :func:`_ln_int8_kernel`.

    Dynamic per-token quantization pays two VPU max-abs row reductions (512-
    and 2048-wide), two per-row reciprocals and a rank-1 dequant per
    sublayer — measured ~0.13-0.16 ms of the 0.560 ms batch-32 sublayer
    (docs/DESIGN.md round-3 roofline: the only stage above its floor). With
    CALIBRATED scales (per schedule-step, per block — see
    ``GenerationEngine.calibrate_act_scales``) the quantize step is one
    multiply + clip + round and the dequant row vectors ``d1 = s1*ah/127`` /
    ``d2 = s2*ag/127`` are precombined outside the kernel, so the whole
    VPU chain per matmul is mul/clip/round in, one broadcast mul out. The
    clip saturates activations that exceed the calibration amax (int8
    saturation semantics — same failure mode as any static-quant scheme).
    """
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

    hq = jnp.round(jnp.clip(h * ih_ref[0, 0], -127.0, 127.0)).astype(jnp.int8)
    acc = mxu_dot(hq, w1q_ref[...], jnp.int32)
    p = acc.astype(jnp.float32) * d1_ref[...] + b1_ref[...].astype(jnp.float32)
    inner = p.shape[-1] // 2
    val, gate = p[:, :inner], p[:, inner:]
    g = val * _gelu_poly(gate)

    gq = jnp.round(jnp.clip(g * ig_ref[0, 0], -127.0, 127.0)).astype(jnp.int8)
    acc2 = mxu_dot(gq, w2q_ref[...], jnp.int32)
    out = acc2.astype(jnp.float32) * d2_ref[...]
    out = out + b2_ref[...].astype(jnp.float32) + xf
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale_shift_mod", "ln_eps", "block", "interpret")
)
def fused_ln_geglu_residual_int8_static(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    w1q: jax.Array,
    d1: jax.Array,
    b1: jax.Array,
    w2q: jax.Array,
    d2: jax.Array,
    b2: jax.Array,
    inv_h: jax.Array,
    inv_g: jax.Array,
    scale_shift_mod: bool = True,
    ln_eps: float = 1e-5,
    block: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fused_ln_geglu_residual_int8` with CALIBRATED static activation
    scales (see :func:`_ln_int8_static_kernel`).

    ``inv_h``/``inv_g``: (1, 1) f32 quantization multipliers ``127 / amax``
    for the post-LN/mod activations and the gated product. ``d1`` (1,
    2*inner) / ``d2`` (1, dim): weight column scales PREMULTIPLIED by the
    matching activation scale (``s1 * ah/127``, ``s2 * ag/127``). Lossy;
    opt-in via ``use_int8_ff="static"`` on the DiT, quality-gated by
    scripts/int8_gate.py."""
    if not block:
        block = 512 if jnp.dtype(x.dtype).itemsize <= 2 else 256
    bsz, n, dim = x.shape
    assert w2q.shape[-1] == dim, "residual fusion needs out_dim == dim"
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] != 1:
            raise ValueError(
                f"fused_ln_geglu_residual_int8_static: {name} must be (B, 1, D)-"
                f"broadcastable, got {a.shape}"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (bsz, 1, dim))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (bsz, 1, dim))
    two_inner = w1q.shape[-1]
    d1 = d1.reshape(1, two_inner).astype(jnp.float32)
    d2 = d2.reshape(1, dim).astype(jnp.float32)
    inv_h = jnp.asarray(inv_h, jnp.float32).reshape(1, 1)
    inv_g = jnp.asarray(inv_g, jnp.float32).reshape(1, 1)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    kernel = functools.partial(
        _ln_int8_static_kernel, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nb * block, dim), x.dtype),
        interpret=interpret,
    )(x, scale, shift, w1q, d1, b1.reshape(1, -1), w2q, d2, b2.reshape(1, -1),
      inv_h, inv_g)
    if pad:
        out = out[:, :n]
    return out


def quantize_cols(w: jax.Array):
    """Per-output-column symmetric int8: ``(w_q int8, s_col f32 (1, out))``
    with ``w ~= w_q * s_col``."""
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_ff_tree(params) -> dict:
    """Walk a flax params tree and build the mirror ``"int8"`` collection:
    every ``ff`` node carrying ``proj_in``/``proj_out`` Dense kernels gains
    ``{w1q, s1, w2q, s2}`` at the same tree path. Run ONCE per weight set
    (outside any sampling loop) and pass the result as
    ``apply({"params": p, "int8": q}, ...)``."""
    def walk(d):
        out = {}
        for k, v in d.items():
            if not isinstance(v, dict):
                continue
            if k == "ff" and "proj_in" in v and "proj_out" in v:
                w1q, s1 = quantize_cols(v["proj_in"]["kernel"])
                w2q, s2 = quantize_cols(v["proj_out"]["kernel"])
                out[k] = {"w1q": w1q, "s1": s1, "w2q": w2q, "s2": s2}
            else:
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    return walk(params)


@functools.partial(
    jax.jit, static_argnames=("scale_shift_mod", "ln_eps", "block", "interpret")
)
def fused_ln_geglu_residual_int8(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    w1q: jax.Array,
    s1: jax.Array,
    b1: jax.Array,
    w2q: jax.Array,
    s2: jax.Array,
    b2: jax.Array,
    scale_shift_mod: bool = True,
    ln_eps: float = 1e-5,
    block: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fused_ln_geglu_residual` with int8 weights + dynamic per-token
    int8 activations (see :func:`_ln_int8_kernel`). ``w1q``/``w2q`` int8 with
    f32 column scales ``s1`` (1, 2*inner) / ``s2`` (1, dim) from
    :func:`quantize_cols`. Lossy (~1.5% rel per sublayer); opt-in via
    ``use_int8_ff`` on the DiT (quantized inference), gated end-to-end by
    scripts/perf_probe4.py and tests/test_fused_kernels.py. ``block`` 0 =
    auto (dtype-aware, see :func:`fused_ln_geglu_residual`)."""
    if not block:
        block = 512 if jnp.dtype(x.dtype).itemsize <= 2 else 256
    bsz, n, dim = x.shape
    assert w2q.shape[-1] == dim, "residual fusion needs out_dim == dim"
    for name, a in (("scale", scale), ("shift", shift)):
        if a.ndim >= 2 and a.shape[-2] != 1:
            raise ValueError(
                f"fused_ln_geglu_residual_int8: {name} must be (B, 1, D)-"
                f"broadcastable, got {a.shape}"
            )
    scale = jnp.broadcast_to(scale.astype(x.dtype), (bsz, 1, dim))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (bsz, 1, dim))
    two_inner = w1q.shape[-1]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    kernel = functools.partial(
        _ln_int8_kernel, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nb * block, dim), x.dtype),
        interpret=interpret,
    )(x, scale, shift, w1q, s1, b1.reshape(1, -1), w2q, s2, b2.reshape(1, -1))
    if pad:
        out = out[:, :n]
    return out


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    # storage dtype follows x (bf16 in the engines); the MXU accumulates in
    # f32 internally either way — numerics match the unfused flax Dense path
    x = x_ref[...]
    h = mxu_dot(x, w1_ref[...], jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    inner = h.shape[-1] // 2
    val, gate = h[:, :inner], h[:, inner:]
    g = val * _gelu_exact(gate)
    out = mxu_dot(g, w2_ref[...], jnp.float32)
    o_ref[...] = (out + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def geglu_ff(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``(proj_in -> GEGLU -> proj_out)(x)`` fused in VMEM.

    x: (..., N, dim); w1: (dim, 2*inner); b1: (2*inner,); w2: (inner,
    out_dim); b2: (out_dim,). Returns (..., N, out_dim) in x.dtype. The
    leading axes are flattened into the token axis (the FF is pointwise over
    tokens). Inference-path only (no autodiff rule).
    """
    lead = x.shape[:-1]
    dim = x.shape[-1]
    two_inner = w1.shape[-1]
    out_dim = w2.shape[-1]
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    n = 1
    for s in lead:
        n *= s
    xf = x.reshape(n, dim)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, two_inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block, out_dim), x.dtype),
        interpret=interpret,
    )(xf, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    if pad:
        out = out[:n]
    return out.reshape(*lead, out_dim)
