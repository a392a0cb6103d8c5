"""int8 fused folded occupancy decode (round-3 quantized inference).

After the decode-tail fold (``VecSetVAE._decode_queries_folded``) the
per-query chain is:

    pts -> Fourier point-embed -> LayerNorm -> q-proj -> scores vs M latent
    keys -> softmax -> dot with the folded (M,) value vector -> logit

The bf16 Pallas version of this kernel (round 2, see docs/DESIGN.md dead
ends / git history of ``ops/fold_decode_kernel.py``) was ~10% SLOWER than
the XLA folded path: after the fold the decode is MXU-pipeline-bound, so
saving HBM traffic bought nothing. int8 changes the economics: the q-proj
and score matmuls — the two dominant contractions, ~75% of the kernel's
MXU work — run int8 x int8 -> int32 at the MXU's double 8-bit rate.
An XLA-level int8 rewrite of the same math was measured 50% SLOWER than
bf16 XLA (scripts/perf_probe5.py: the dynamic-quant elementwise ops break
XLA's matmul pipelining), hence this kernel.

Quantization: wq per-output-column static; k per-latent-row static (both
once per frame, outside the kernel — k is chunk-invariant); the embedded
queries and projected q per-row dynamic in VMEM. Softmax and the folded
matvec stay f32.

Math notes (inherited from the bf16 kernel):
- The Fourier embed ``[sin(p B), cos(p B), p] @ W1`` is reshaped into three
  MXU-friendly matmuls with zero-padded weights. cos(0)=1 on padding
  columns is harmless because the corresponding W1c rows are zero.
- The occupancy head bias is folded INTO the value vector: softmax rows sum
  to 1, so ``p @ (v + b) == p @ v + b``.
- Queries are passed transposed (B, 8, Q) (coordinate rows zero-padded
  3->8) so the lane dimension is the query axis.

Matches the reference chain models_ae.py:417-424 (same reassociated
algebra as the unfused folded path, plus int8 rounding). Inference-only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUB = 512  # queries per in-kernel sub-block (bounds live f32 VMEM buffers)


def _q8_rows(h):
    """Dynamic per-row symmetric int8: returns (int8 rows, f32 (rows, 1) scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-8) / 127.0
    return jnp.round(h / s).astype(jnp.int8), s


def _kernel(qT_ref, basis_ref, w1s_ref, w1c_ref, wxyz_ref, b1_ref, g_ref, be_ref,
            wq8_ref, wqs_ref, k8_ref, ks_ref, vf_ref, o_ref,
            *, scale: float, ln_eps: float):
    blk = qT_ref.shape[-1]
    cd = (((0,), (0,)), ((), ()))  # contract the coordinate axis
    rows_per_sub = _SUB // (blk // 8)
    for sub in range(blk // _SUB):  # sequential sub-blocks: caps VMEM at ~_SUB rows
        ptsT = qT_ref[0, :, sub * _SUB : (sub + 1) * _SUB].astype(jnp.float32)  # (8, SUB)
        # phases in f32 (bf16 phases would lose whole radians at the top
        # Fourier frequency); the sin/cos FACTORS are in [-1, 1] and feed
        # bf16 matmuls — f32 dots run at 1/8 MXU rate and dominated the
        # round-2 bf16 kernel's loss to XLA
        P = jax.lax.dot_general(ptsT, basis_ref[...], cd, preferred_element_type=jnp.float32)
        emb = (
            jnp.dot(jnp.sin(P).astype(jnp.bfloat16), w1s_ref[...],
                    preferred_element_type=jnp.float32)
            + jnp.dot(jnp.cos(P).astype(jnp.bfloat16), w1c_ref[...],
                      preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ptsT, wxyz_ref[...], cd, preferred_element_type=jnp.float32)
            + b1_ref[...]
        )  # (SUB, D) point embedding in f32
        m = jnp.mean(emb, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(emb), axis=-1, keepdims=True) - jnp.square(m)
        h = (emb - m) * jax.lax.rsqrt(v + ln_eps) * g_ref[...] + be_ref[...]

        h8, h_s = _q8_rows(h)
        qacc = jnp.dot(h8, wq8_ref[...], preferred_element_type=jnp.int32)
        q = qacc.astype(jnp.float32) * h_s * wqs_ref[...]  # (SUB, D)

        q8, q_s = _q8_rows(q)
        sacc = jax.lax.dot_general(
            q8, k8_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (SUB, M)
        s = sacc.astype(jnp.float32) * (q_s * scale) * ks_ref[0]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        logit = jnp.sum(p * vf_ref[0], axis=-1)  # (SUB,) folded values (+ bias inside)
        o_ref[0, 0, sub * rows_per_sub : (sub + 1) * rows_per_sub] = logit.reshape(
            rows_per_sub, blk // 8
        )


@functools.partial(jax.jit, static_argnames=("block", "ln_eps", "interpret"))
def fused_fold_decode_int8(
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
    """Occupancy logits (B, Q), int8 q-proj + scores (see module docstring).

    ``block`` must be a multiple of 1024 and at most ``8 * _SUB`` (the
    result tile is (8, block//8) and sub-blocks hold ``_SUB`` queries).
    """
    assert block % 1024 == 0 and block <= 8 * _SUB, block
    b, nq, _ = queries.shape
    f = basis.shape[1]
    d = wq.shape[0]
    m = k.shape[1]

    fpad = 128 * (-(-f // 128))
    basis_pad = jnp.zeros((8, fpad), jnp.float32).at[:3, :f].set(basis.astype(jnp.float32))
    w1 = w1.astype(jnp.float32)
    w1s = jnp.zeros((fpad, d), jnp.bfloat16).at[:f].set(w1[:f].astype(jnp.bfloat16))
    w1c = jnp.zeros((fpad, d), jnp.bfloat16).at[:f].set(w1[f : 2 * f].astype(jnp.bfloat16))
    wxyz = jnp.zeros((8, d), jnp.float32).at[:3].set(w1[2 * f :])

    # static quantization: wq per-output-column, k per-latent-row
    wqf = wq.astype(jnp.float32)
    wq_s = jnp.maximum(jnp.max(jnp.abs(wqf), axis=0, keepdims=True), 1e-8) / 127.0
    wq8 = jnp.round(wqf / wq_s).astype(jnp.int8)  # (D, D)
    kf = k.astype(jnp.float32)
    k_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0  # (B, M)
    k8 = jnp.round(kf / k_s[..., None]).astype(jnp.int8)  # (B, M, D)

    nb = -(-nq // block)
    pad = nb * block - nq
    qT = jnp.swapaxes(queries.astype(jnp.float32), 1, 2)  # (B, 3, Q)
    qT = jnp.pad(qT, ((0, 0), (0, 5), (0, pad)))  # (B, 8, Q_pad)

    kernel = functools.partial(_kernel, scale=float(d) ** -0.5, ln_eps=ln_eps)
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
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
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
        wq8,
        wq_s,
        k8,
        k_s.reshape(b, 1, m),
        v_fold.astype(jnp.float32).reshape(b, 1, m),
    )
    return out.reshape(b, nb * block)[:, :nq]
