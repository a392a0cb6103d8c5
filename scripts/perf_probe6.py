"""Probe 6: where does the int8 fused-FF kernel's time go?

perf_probe_attrib shows the 35-NFE sampler is still 77% of the chain at the
batch-32 operating point, and the FF sublayer is the sampler's largest
tower. The int8 kernel measured only -17% vs bf16 (0.415 -> 0.344 ms at
batch 16) where the MXU's 8-bit mode is nominally 2x. Hypotheses:

  (a) Mosaic does not actually run int8 x int8 -> int32 at double rate at
      these shapes (the gain was just halved weight HBM), or
  (b) the MXU is at rate but the kernel is bound by the serialized VPU
      chain (LN, dynamic activation quant, two dequant passes, exact-erf
      GELU, gate product, re-quant) that runs between the two matmuls in
      each grid step.

This probe times, at the DiT FF shapes ((B*512, 512) x (512, 4096) then
(B*512, 2048) x (2048, 512)), with a fori_loop of reps inside one jit to
amortize the ~30 ms dispatch overhead:

  1. pure bf16 Pallas matmul pair (no LN/quant/GELU)
  2. pure int8 Pallas matmul pair (pre-quantized ints in, int32 out)
  3. the shipped bf16 fused kernel
  4. the shipped int8 fused kernel

(2)/(1) isolates the MXU int8 rate; (4)-(2) isolates the VPU+quant cost.

Run: python scripts/perf_probe6.py [batch] (from the repo root; PYTHONPATH
must keep /root/.axon_site)
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
    fused_ln_geglu_residual,
    fused_ln_geglu_residual_int8,
    quantize_cols,
)

REPS = 200


def _pair_kernel_bf16(x_ref, w1_ref, w2_ref, o_ref):
    p = mxu_dot(x_ref[0], w1_ref[...], jnp.float32)
    inner = p.shape[-1] // 2
    g = (p[:, :inner] * p[:, inner:]).astype(jnp.bfloat16)
    o_ref[0] = mxu_dot(g, w2_ref[...], jnp.float32).astype(o_ref.dtype)


def _pair_kernel_int8(x_ref, w1_ref, w2_ref, o_ref):
    acc = mxu_dot(x_ref[0], w1_ref[...], jnp.int32)
    inner = acc.shape[-1] // 2
    # cheapest possible bridge to a second int8 matmul: shift down and cast
    g = ((acc[:, :inner] + acc[:, inner:]) >> 8).astype(jnp.int8)
    o_ref[0] = mxu_dot(g, w2_ref[...], jnp.int32).astype(o_ref.dtype)


def _pair(kernel, x, w1, w2, out_dtype, block=512):
    bsz, n, dim = x.shape
    two_inner = w1.shape[-1]
    nb = -(-n // block)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, two_inner), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, dim), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, dim), out_dtype),
    )(x, w1, w2)


def timed_loop(fn, x, reps=REPS):
    """Run ``fn`` reps times inside one jit (x -> x-shaped chain)."""

    @jax.jit
    def loop(x):
        def body(_, x):
            return fn(x)

        return jax.lax.fori_loop(0, reps, body, x)

    np.asarray(jnp.ravel(loop(x))[:1])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(jnp.ravel(loop(x))[:1])
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n, dim, inner = 512, 512, 2048
    two_inner = 2 * inner
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, n, dim), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (dim, two_inner), jnp.float32) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(rng, 2), (inner, dim), jnp.float32) * 0.02
    b1 = jnp.zeros((two_inner,), jnp.float32)
    b2 = jnp.zeros((dim,), jnp.float32)
    scale = jnp.zeros((batch, 1, dim), jnp.bfloat16)
    shift = jnp.zeros((batch, 1, dim), jnp.bfloat16)

    gop = batch * n * (dim * two_inner + inner * dim) * 2 / 1e9

    # 1. pure bf16 matmul pair
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    t1 = timed_loop(
        lambda v: _pair(_pair_kernel_bf16, v, w1b, w2b, jnp.bfloat16), xb
    )
    print(f"1. pure bf16 matmul pair:   {t1*1e3:7.3f} ms  {gop/t1/1e3:6.1f} TOP/s")

    # 2. pure int8 matmul pair (int8 chain keeps shapes: in (B,n,dim) int8)
    xq = jnp.clip(jnp.round(x * 10), -127, 127).astype(jnp.int8)
    w1q8 = jnp.clip(jnp.round(w1 * 500), -127, 127).astype(jnp.int8)
    w2q8 = jnp.clip(jnp.round(w2 * 500), -127, 127).astype(jnp.int8)
    t2 = timed_loop(
        lambda v: _pair(_pair_kernel_int8, v, w1q8, w2q8, jnp.int32).astype(jnp.int8),
        xq,
    )
    print(f"2. pure int8 matmul pair:   {t2*1e3:7.3f} ms  {gop/t2/1e3:6.1f} TOP/s"
          f"   (vs bf16: {t1/t2:.2f}x)")

    # 3. shipped bf16 fused kernel
    t3 = timed_loop(
        lambda v: fused_ln_geglu_residual(v, scale, shift, w1b, b1, w2b, b2), xb
    )
    print(f"3. fused bf16 FF sublayer:  {t3*1e3:7.3f} ms  {gop/t3/1e3:6.1f} TOP/s")

    # 4. shipped int8 fused kernel
    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    t4 = timed_loop(
        lambda v: fused_ln_geglu_residual_int8(v, scale, shift, w1q, s1, b1, w2q, s2, b2),
        xb,
    )
    print(f"4. fused int8 FF sublayer:  {t4*1e3:7.3f} ms  {gop/t4/1e3:6.1f} TOP/s"
          f"   (vs fused bf16: {t3/t4:.2f}x)")
    print(f"\nVPU+quant overhead (4 - 2): {(t4-t2)*1e3:.3f} ms per sublayer"
          f"  |  MXU int8 speedup available: {t1/t2:.2f}x"
          f"  |  batch {batch}, {REPS} reps")


if __name__ == "__main__":
    main()
