"""A/B the fully-fused folded-decode Pallas kernel on TPU.

Run: PYTHONPATH=/root/repo python scripts/perf_probe5.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.models.registry import get_ae_model


def log(*a):
    print(*a, flush=True)


def sync(out):
    return np.asarray(out[(slice(0, 1),) * out.ndim])


def timeit(fn, args, iters=3):
    sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree
    )


def main():
    log(f"device: {jax.devices()[0]}")
    rng = jax.random.PRNGKey(0)
    vae_fold = get_ae_model("kl_d512_m512_l32_mix", N=10000, dtype=jnp.bfloat16,
                            fold_decode_tail=True)
    vae_fused = get_ae_model("kl_d512_m512_l32_mix", N=10000, dtype=jnp.bfloat16,
                             fold_decode_tail=True, use_fused_decode=True)
    params = cast_bf16(vae_fold.init(
        {"params": rng, "latent": jax.random.fold_in(rng, 1)},
        jnp.zeros((1, 10000, 3)), jnp.zeros((1, 64, 3)),
    )["params"])

    f_fold = jax.jit(lambda p, t, q: vae_fold.apply({"params": p}, t, q, method="decode"))
    f_fuse = jax.jit(lambda p, t, q: vae_fused.apply({"params": p}, t, q, method="decode"))

    for b in (8, 16):
        tokens = jax.random.normal(rng, (b, 512, 32), jnp.float32)
        queries = jax.random.uniform(jax.random.fold_in(rng, 1), (b, 500_000, 3),
                                     jnp.float32, -1, 1)
        t0 = timeit(f_fold, (params, tokens, queries))
        t1 = timeit(f_fuse, (params, tokens, queries))
        log(f"batch {b}: folded-XLA {t0*1e3:7.1f} ms | fused-kernel {t1*1e3:7.1f} ms "
            f"(delta {(t0-t1)*1e3:+7.1f} ms)")

    # block-size sweep at batch 16 via monkeypatched default
    import rald_tpu.ops.fold_decode_kernel as fdk
    orig = fdk.fused_fold_decode
    tokens = jax.random.normal(rng, (16, 512, 32), jnp.float32)
    queries = jax.random.uniform(jax.random.fold_in(rng, 1), (16, 500_000, 3),
                                 jnp.float32, -1, 1)
    for blk in (2048, 4096):
        fdk.fused_fold_decode = functools.partial(orig, block=blk)
        fb = jax.jit(lambda p, t, q: vae_fused.apply({"params": p}, t, q, method="decode"))
        t = timeit(fb, (params, tokens, queries))
        log(f"block {blk:5d}: {t*1e3:7.1f} ms (batch 16)")
    fdk.fused_fold_decode = orig

    # numeric check on-device
    tokens = jax.random.normal(rng, (2, 512, 32), jnp.float32)
    queries = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 8192, 3), jnp.float32, -1, 1)
    a = np.asarray(f_fold(params, tokens, queries), np.float32)
    b_ = np.asarray(f_fuse(params, tokens, queries), np.float32)
    log(f"max|a-b|={np.abs(a-b_).max():.4f} mean|a|={np.abs(a).mean():.4f} "
        f"occ-agree={np.mean((a>0)==(b_>0))*100:.3f}%")


if __name__ == "__main__":
    main()
