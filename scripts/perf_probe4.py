"""Probe 4: int8-weight FF experiment (round-3, VERDICT lever #2).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (394 TOPs vs 197
TFLOPs). The DiT FF sublayer is 55% of NFE time (perf_probe2 tower
knockouts) and, after the round-2/3 fusion work, is mostly MXU-bound (the
fused kernel already keeps all intermediates in VMEM). If the two FF
matmuls can run int8 with acceptable accuracy, the sampler's 39 ms/frame
could approach ~31.

Scheme (standard dynamic activation quantization):
  - weights: per-output-column symmetric int8 (w_q = round(w / s_col),
    s_col = amax_col / 127), quantized once on the host;
  - activations: per-row (per-token) symmetric int8 computed inside the
    kernel after the LN+mod (h_q = round(h * 127 / amax_row));
  - dot(h_q, w_q, preferred_element_type=int32), dequantized by the rank-1
    outer product of row/col scales. GEGLU gate nonlinearity in f32.

Run: PYTHONPATH=/root/repo python scripts/perf_probe4.py [--tpu]
  without --tpu: interpret-mode accuracy check only (CPU, fast)
  with    --tpu: full-size timing bf16-fused vs int8-fused + accuracy
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

from rald_tpu.ops.geglu_kernel import _gelu_exact, fused_ln_geglu_residual


def _ln_int8_kernel(x_ref, s_ref, b_ref, w1q_ref, s1_ref, b1_ref,
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

    # dynamic per-row int8 quantization of the activations
    hmax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
    hq = jnp.round(h * (127.0 / hmax)).astype(jnp.int8)
    acc = jnp.dot(hq, w1q_ref[...], preferred_element_type=jnp.int32)
    # dequant: row scale (block,1) x col scale (1,2I)
    p = acc.astype(jnp.float32) * (hmax / 127.0) * s1_ref[...]
    p = p + b1_ref[...].astype(jnp.float32)
    inner = p.shape[-1] // 2
    val, gate = p[:, :inner], p[:, inner:]
    g = val * _gelu_exact(gate)

    gmax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-6)
    gq = jnp.round(g * (127.0 / gmax)).astype(jnp.int8)
    acc2 = jnp.dot(gq, w2q_ref[...], preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * (gmax / 127.0) * s2_ref[...]
    out = out + b2_ref[...].astype(jnp.float32) + xf
    o_ref[0] = out.astype(o_ref.dtype)


def quantize_cols(w):
    """Per-output-column symmetric int8: returns (w_q int8, s_col f32 (1, out))."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("scale_shift_mod", "ln_eps", "block", "interpret")
)
def fused_ln_geglu_residual_int8(
    x, scale, shift, w1q, s1, b1, w2q, s2, b2,
    scale_shift_mod: bool = True, ln_eps: float = 1e-5,
    block: int = 512, interpret: bool = False,
):
    bsz, n, dim = x.shape
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


def _ref(x, scale, shift, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, -1, keepdims=True)
    v = jnp.var(xf, -1, keepdims=True)
    h = (xf - m) / jnp.sqrt(v + 1e-5)
    h = h * (1 + scale) + shift
    p = h @ w1 + b1
    inner = p.shape[-1] // 2
    g = p[..., :inner] * jax.nn.gelu(p[..., inner:], approximate=False)
    return xf + g @ w2 + b2


def accuracy(interpret):
    rng = jax.random.PRNGKey(0)
    b, n, d, inner = 2, 512, 128, 512
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = 0.1 * jax.random.normal(ks[1], (b, 1, d))
    sh = 0.1 * jax.random.normal(ks[2], (b, 1, d))
    w1 = jax.random.normal(ks[3], (d, 2 * inner)) * (d ** -0.5)
    b1 = 0.01 * jax.random.normal(ks[4], (2 * inner,))
    w2 = jax.random.normal(ks[5], (inner, d)) * (inner ** -0.5)
    b2 = 0.01 * jax.random.normal(ks[6], (d,))
    ref = _ref(x, sc, sh, w1, b1, w2, b2)
    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    out = fused_ln_geglu_residual_int8(
        x, sc, sh, w1q, s1, b1, w2q, s2, b2, interpret=interpret
    )
    ref_n, out_n = np.asarray(ref), np.asarray(out, np.float32)
    err = np.abs(ref_n - out_n)
    rel = err.max() / np.abs(ref_n).max()
    corr = np.corrcoef(ref_n.ravel(), out_n.ravel())[0, 1]
    print(f"int8 FF accuracy: max|err|={err.max():.4f} rel={rel:.4f} "
          f"corr={corr:.7f} (scale={np.abs(ref_n).max():.2f})", flush=True)


def timing():
    b, n, d, inner = 16, 512, 512, 2048
    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, n, d), dt)
    sc = (0.1 * jax.random.normal(ks[1], (b, 1, d))).astype(dt)
    sh = (0.1 * jax.random.normal(ks[2], (b, 1, d))).astype(dt)
    w1 = (jax.random.normal(ks[3], (d, 2 * inner)) * (d ** -0.5)).astype(dt)
    b1 = jnp.zeros((2 * inner,), dt)
    w2 = (jax.random.normal(ks[5], (inner, d)) * (inner ** -0.5)).astype(dt)
    b2 = jnp.zeros((d,), dt)
    w1q, s1 = quantize_cols(w1.astype(jnp.float32))
    w2q, s2 = quantize_cols(w2.astype(jnp.float32))

    REPS = 50

    @jax.jit
    def loop_bf16(x):
        def body(_, x):
            return fused_ln_geglu_residual(x, sc, sh, w1, b1, w2, b2)
        return jax.lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def loop_int8(x):
        def body(_, x):
            return fused_ln_geglu_residual_int8(x, sc, sh, w1q, s1, b1, w2q, s2, b2)
        return jax.lax.fori_loop(0, REPS, body, x)

    for name, fn in (("bf16-fused", loop_bf16), ("int8-fused", loop_int8)):
        np.asarray(fn(x)[:1, :1, :1])  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x)[:1, :1, :1])
            best = min(best, time.perf_counter() - t0)
        per = best / REPS * 1e3
        print(f"{name}: {per:.3f} ms per ({b},{n},{d})x{inner} FF sublayer "
              f"({best*1e3:.1f} ms / {REPS} reps)", flush=True)


if __name__ == "__main__":
    on_tpu = "--tpu" in sys.argv
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    accuracy(interpret=not on_tpu)
    if on_tpu:
        timing()
