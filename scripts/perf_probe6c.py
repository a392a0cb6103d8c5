"""Probe 6c: transcendental-free GELU inside the int8 FF kernel.

perf_probe6b showed the int8 kernel's VPU chain (0.264 ms/sublayer at
batch 32) is additive with the MXU — Mosaic cannot overlap them at these
shapes — so the only lever is fewer VPU ops. The exact-erf GELU
(A&S 7.1.26 rational: exp + divide + 5 FMA on the (rows, 2048) gate) is
the chain's largest single consumer IF the VPU's transcendental unit is
slow; this probe answers that empirically with a clamped odd-polynomial
erf (degree 13 = x * P(x^2), 7 Horner FMA, no exp, no divide;
max |erf err| 2.6e-4 on [-3, 3], clamp err 2.2e-5 beyond — both ~30x
below the int8 path's own per-token quantization noise of ~8e-3 rel).

Run: python scripts/perf_probe6c.py [batch]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from rald_tpu.ops._mxu import mxu_dot
from rald_tpu.ops.geglu_kernel import (
    fused_ln_geglu_residual_int8,
    quantize_cols,
)

REPS = 200

# erf(x) ~= clamp(x * P(x^2)) fit on [0, 3] (scripts history / probe6c doc)
_ERF_POLY = (
    1.1279297779e+00, -3.7341796931e-01, 1.0799495029e-01, -2.2859888852e-02,
    3.3732705085e-03, -3.2356449396e-04, 1.7898980961e-05, -4.2960337090e-07,
)


def _erf_poly(x):
    x2 = x * x
    p = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        p = p * x2 + jnp.float32(c)
    return jnp.clip(x * p, -1.0, 1.0)


def _gelu_poly(x):
    return x * 0.5 * (1.0 + _erf_poly(x * np.float32(1 / np.sqrt(2.0))))


def _ln_int8_poly_kernel(x_ref, s_ref, b_ref, w1q_ref, s1_ref, b1_ref,
                         w2q_ref, s2_ref, b2_ref, o_ref,
                         *, ln_eps: float, scale_shift_mod: bool):
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
    g = p[:, :inner] * _gelu_poly(p[:, inner:])
    gmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-6)
    gq = jnp.round(g * (127.0 / gmax)).astype(jnp.int8)
    acc2 = mxu_dot(gq, w2q_ref[...], jnp.int32)
    out = acc2.astype(jnp.float32) * (gmax / 127.0) * s2_ref[...]
    out = out + b2_ref[...].astype(jnp.float32) + xf
    o_ref[0] = out.astype(o_ref.dtype)


def fused_int8_poly(x, scale, shift, w1q, s1, b1, w2q, s2, b2,
                    scale_shift_mod=True, ln_eps=1e-5, block=512):
    bsz, n, dim = x.shape
    scale = jnp.broadcast_to(scale.astype(x.dtype), (bsz, 1, dim))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (bsz, 1, dim))
    two_inner = w1q.shape[-1]
    nb = -(-n // block)
    kernel = functools.partial(
        _ln_int8_poly_kernel, ln_eps=ln_eps, scale_shift_mod=scale_shift_mod
    )
    return pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, dim), x.dtype),
    )(x, scale, shift, w1q, s1, b1.reshape(1, -1), w2q, s2, b2.reshape(1, -1))


def timed_loop(fn, x, reps=REPS):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda _, v: fn(v), x)

    np.asarray(jnp.ravel(loop(x))[:1])
    t0 = time.perf_counter()
    np.asarray(jnp.ravel(loop(x))[:1])
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n, dim, inner = 512, 512, 2048
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, n, dim), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (dim, 2 * inner), jnp.float32) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(rng, 2), (inner, dim), jnp.float32) * 0.02
    b1 = jnp.zeros((2 * inner,), jnp.float32)
    b2 = jnp.zeros((dim,), jnp.float32)
    scale = jnp.full((batch, 1, dim), 0.1, jnp.bfloat16)
    shift = jnp.full((batch, 1, dim), 0.05, jnp.bfloat16)
    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    gop = batch * n * (dim * 2 * inner + inner * dim) * 2 / 1e9

    ref = fused_ln_geglu_residual_int8(x, scale, shift, w1q, s1, b1, w2q, s2, b2)
    t0 = timed_loop(
        lambda v: fused_ln_geglu_residual_int8(v, scale, shift, w1q, s1, b1, w2q, s2, b2),
        x,
    )
    print(f"shipped int8 kernel (exact erf): {t0*1e3:7.3f} ms  {gop/t0/1e3:6.1f} TOP/s")

    out = fused_int8_poly(x, scale, shift, w1q, s1, b1, w2q, s2, b2)
    d = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
    rel = float(jnp.max(d) / jnp.max(jnp.abs(ref.astype(jnp.float32))))
    t1 = timed_loop(
        lambda v: fused_int8_poly(v, scale, shift, w1q, s1, b1, w2q, s2, b2), x
    )
    print(f"poly-gelu int8 kernel:           {t1*1e3:7.3f} ms  {gop/t1/1e3:6.1f} TOP/s"
          f"   (vs shipped: {t0/t1:.2f}x, max rel diff {rel:.2e})")


if __name__ == "__main__":
    main()
