"""Probe 6b: hide the int8 FF kernel's VPU chain behind the MXU.

perf_probe6 decomposition (batch 32, per FF sublayer): pure int8 matmul
pair 0.409 ms vs the shipped fused int8 kernel 0.674 ms — 0.264 ms of
LN/quant/dequant/GELU VPU work that executes SERIALLY with the MXU because
each grid step's data flow is one straight dependency chain.

Idea: split the 512-row block into H independent row-slices and interleave
their stages in program order, giving Mosaic's scheduler independent VPU
work to overlay on in-flight MXU matmuls:

    quant(s0); mm1(s0); quant(s1); mm1(s1); gelu+quant(s0); mm2(s0); ...

Math per row is IDENTICAL to the shipped kernel (same LN, same scales,
same GELU) — only instruction order changes. This probe measures H in
{1 (shipped), 2, 4} before touching the shipped kernel.

Run: python scripts/perf_probe6b.py [batch]
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
    _gelu_exact,
    fused_ln_geglu_residual_int8,
    quantize_cols,
)

REPS = 200


def _ln_int8_interleaved_kernel(x_ref, s_ref, b_ref, w1q_ref, s1_ref, b1_ref,
                                w2q_ref, s2_ref, b2_ref, o_ref,
                                *, ln_eps: float, scale_shift_mod: bool,
                                halves: int):
    x = x_ref[0]
    rows = x.shape[0]
    assert rows % halves == 0
    h_rows = rows // halves
    s_row = s_ref[0].astype(jnp.float32)
    b_row = b_ref[0].astype(jnp.float32)
    w1q = w1q_ref[...]
    w2q = w2q_ref[...]
    s1 = s1_ref[...]
    s2 = s2_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)

    def ln_quant(xs):
        xf = xs.astype(jnp.float32)
        m = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
        h = (xf - m) * jax.lax.rsqrt(var + ln_eps)
        if scale_shift_mod:
            h = h * (1.0 + s_row) + b_row
        else:
            h = h * s_row + b_row
        hmax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
        hq = jnp.round(h * (127.0 / hmax)).astype(jnp.int8)
        return hq, hmax, xf

    def mid(acc, hmax):
        p = acc.astype(jnp.float32) * (hmax / 127.0) * s1
        p = p + b1
        inner = p.shape[-1] // 2
        g = p[:, :inner] * _gelu_exact(p[:, inner:])
        gmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-6)
        gq = jnp.round(g * (127.0 / gmax)).astype(jnp.int8)
        return gq, gmax

    # stage 0: LN+quant all slices (VPU), issuing mm1 as each becomes ready
    sl = [ln_quant(x[i * h_rows:(i + 1) * h_rows]) for i in range(halves)]
    acc1 = [None] * halves
    gqs = [None] * halves
    acc2 = [None] * halves
    for i in range(halves):
        acc1[i] = mxu_dot(sl[i][0], w1q, jnp.int32)          # MXU slice i
    for i in range(halves):
        gqs[i] = mid(acc1[i], sl[i][1])                       # VPU slice i
        acc2[i] = mxu_dot(gqs[i][0], w2q, jnp.int32)          # MXU slice i
    for i in range(halves):
        out = acc2[i].astype(jnp.float32) * (gqs[i][1] / 127.0) * s2
        out = out + b2 + sl[i][2]
        o_ref[0, i * h_rows:(i + 1) * h_rows] = out.astype(o_ref.dtype)


def fused_int8_interleaved(x, scale, shift, w1q, s1, b1, w2q, s2, b2,
                           halves=2, scale_shift_mod=True, ln_eps=1e-5,
                           block=512):
    bsz, n, dim = x.shape
    scale = jnp.broadcast_to(scale.astype(x.dtype), (bsz, 1, dim))
    shift = jnp.broadcast_to(shift.astype(x.dtype), (bsz, 1, dim))
    two_inner = w1q.shape[-1]
    nb = -(-n // block)
    kernel = functools.partial(
        _ln_int8_interleaved_kernel, ln_eps=ln_eps,
        scale_shift_mod=scale_shift_mod, halves=halves,
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
    print(f"shipped int8 kernel (H=1): {t0*1e3:7.3f} ms  {gop/t0/1e3:6.1f} TOP/s")

    for halves in (2, 4):
        out = fused_int8_interleaved(x, scale, shift, w1q, s1, b1, w2q, s2, b2,
                                     halves=halves)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        t = timed_loop(
            lambda v, h=halves: fused_int8_interleaved(
                v, scale, shift, w1q, s1, b1, w2q, s2, b2, halves=h),
            x,
        )
        print(f"interleaved H={halves}:          {t*1e3:7.3f} ms  {gop/t/1e3:6.1f} TOP/s"
              f"   (vs shipped: {t0/t:.2f}x, max|diff|={err:.2e})")


if __name__ == "__main__":
    main()
