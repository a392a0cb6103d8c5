"""Probe 5: XLA-level int8 folded decode (round-3).

After the tail fold the decode's remaining MXU work is the q-projection
and the query-latent score matmul. `VecSetVAE(int8_decode=True)` runs both
as int8 x int8 -> int32 einsums at the XLA level — the dynamic-quant
elementwise ops fuse into the streaming decode, no Pallas needed (the
round-2/3 Pallas decode kernels lost to XLA's pipelining in bf16; int8
changes the matmul economics without giving up that pipelining).

Run: PYTHONPATH=/root/repo python scripts/perf_probe5.py [--tpu]
  (no flag)  CPU correctness: int8 vs bf16 folded decode agreement
  --tpu      + full-size decode timing (batch 16 x 500k queries)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.models.registry import get_ae_model


def build(batch, n_q, dtype, **kw):
    vae = get_ae_model("kl_d512_m512_l32_mix", N=10000, dtype=dtype,
                       fold_decode_tail=True, **kw)
    rng = jax.random.PRNGKey(0)
    pc0 = jnp.zeros((1, 10000, 3), jnp.float32)
    q0 = jnp.zeros((1, 64, 3), jnp.float32)
    params = vae.init(
        {"params": rng, "latent": jax.random.fold_in(rng, 1)}, pc0, q0
    )["params"]
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
    tokens = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (batch, 512, 32))
    queries = jax.random.uniform(
        jax.random.PRNGKey(4), (batch, n_q, 3), jnp.float32, -1, 1
    )
    fn = jax.jit(lambda p, t, q: vae.apply({"params": p}, t, q, method="decode"))
    return fn, params, tokens, queries


def _int8_interpret_decode(vae, params, tokens, queries):
    """Reproduce the model's int8 branch with interpret=True (CPU)."""
    from rald_tpu.nn.layers import point_fourier_basis
    from rald_tpu.ops.fold_decode_int8 import fused_fold_decode_int8

    import flax.linen as nn

    toks = vae.apply({"params": params}, tokens, method="decode_latents")
    ctx = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": params["dec_norm_ctx"]}, toks
    )
    ca = params["dec_cross_attn"]
    wq = ca["to_q"]["kernel"]
    wk, wv = jnp.split(ca["to_kv"]["kernel"], 2, axis=-1)
    wo, bo = ca["to_out"]["kernel"], ca["to_out"]["bias"]
    wh, bh = params["to_outputs"]["kernel"], params["to_outputs"]["bias"]
    w_tail = wo.astype(jnp.float32) @ wh.astype(jnp.float32)
    bias = bo.astype(jnp.float32) @ wh.astype(jnp.float32) + bh.astype(jnp.float32)
    k = ctx @ wk
    v_fold = (ctx @ wv).astype(jnp.float32) @ w_tail
    pe = params["point_embed"]["mlp"]
    ln = params["dec_norm_q"]
    return fused_fold_decode_int8(
        queries,
        jnp.asarray(point_fourier_basis(48)),
        pe["kernel"], pe["bias"], ln["scale"], ln["bias"], wq,
        k, v_fold[..., 0] + bias, interpret=True,
    )[..., None]


def accuracy(dtype, batch=2, n_q=20000, interpret=False):
    fn, params, tokens, queries = build(batch, n_q, dtype)
    a = np.asarray(fn(params, tokens, queries), np.float32)
    if interpret:
        vae = get_ae_model("kl_d512_m512_l32_mix", N=10000, dtype=dtype,
                           fold_decode_tail=True)
        b = np.asarray(
            _int8_interpret_decode(vae, params, tokens, queries), np.float32
        )
    else:
        fn8, params8, _, _ = build(batch, n_q, dtype, int8_decode=True)
        b = np.asarray(fn8(params, tokens, queries), np.float32)
    occ_a, occ_b = a > 0, b > 0
    agree = (occ_a == occ_b).mean()
    either = occ_a | occ_b
    iou = (occ_a & occ_b).sum() / max(either.sum(), 1)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    print(f"int8 decode agreement: logit corr={corr:.6f} occ-agree={agree:.5f} "
          f"occ-IoU={iou:.5f} (occupied frac={occ_a.mean():.4f})", flush=True)


def timing():
    batch, n_q = 16, 500_000
    for name, kw in (("bf16-fold", {}), ("int8-fold", {"int8_decode": True})):
        fn, params, tokens, queries = build(batch, n_q, jnp.bfloat16, **kw)
        out = fn(params, tokens, queries)
        np.asarray(out[:1, :1])  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(4):
                o = fn(params, tokens, queries)
            np.asarray(o[:1, :1])
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"decode {name}: {best*1e3:.1f} ms/batch "
              f"({batch*n_q/best/1e6:.0f} Mq/s)", flush=True)


if __name__ == "__main__":
    on_tpu = "--tpu" in sys.argv
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
        accuracy(jnp.float32, n_q=4096, interpret=True)
    else:
        accuracy(jnp.bfloat16)
        timing()
