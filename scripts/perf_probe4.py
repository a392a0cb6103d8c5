"""A/B: tree_map-indexed vs stacked AdaLN mod table in the sampler scan.

The indexed table costs 144 dynamic-slice ops per NFE (one per pytree leaf);
the stacked form costs one. Run after the TPU is free:
  PYTHONPATH=/root/repo python scripts/perf_probe4.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.config import Config
from rald_tpu.diffusion.edm import (
    edm_sampler, karras_sigmas, sample_prior_latents, stack_mod_table, unstack_mods,
)
from rald_tpu.models.registry import get_generation_model


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
    mc = Config(
        cond_type="radar", use_radar_cond=True, use_radar_enc=True,
        unfreeze_radar_enc=True, radar_token_channel=512,
        enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
        enc_radar_ch=16, enc_hidden_ch=64,
    )
    model = get_generation_model("kl_d512_m512_l32_d24_edm", mc, dtype=jnp.bfloat16,
                                 use_fused_ff=True)
    rng = jax.random.PRNGKey(0)
    params = cast_bf16(model.init(
        rng, jnp.zeros((1, 512, 32), jnp.float32), jnp.ones((1,)),
        jnp.zeros((1, 128, 64, 32, 3), jnp.float32),
    )["params"])

    def sampler(params, cube, seeds, stacked: bool):
        cond = model.apply({"params": params}, cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)
        t_steps = karras_sigmas(18)
        table = model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")
        if stacked:
            stk = stack_mod_table(table)

            def denoise_indexed(x, sigma, idx):
                mods = unstack_mods(stk[idx])
                return model.apply(
                    {"params": params}, x, sigma, mods, cond, method="denoise_with_mods"
                )
        else:
            def denoise_indexed(x, sigma, idx):
                mods = jax.tree_util.tree_map(lambda a: a[idx], table)
                return model.apply(
                    {"params": params}, x, sigma, mods, cond, method="denoise_with_mods"
                )

        return edm_sampler(lambda x, s: None, latents, denoise_indexed=denoise_indexed)

    f_tree = jax.jit(lambda p, c, s: sampler(p, c, s, False))
    f_stk = jax.jit(lambda p, c, s: sampler(p, c, s, True))
    for b in (8, 16):
        cube = jax.random.normal(rng, (b, 128, 64, 32, 3), jnp.float32)
        seeds = jnp.arange(b)
        t0 = timeit(f_tree, (params, cube, seeds))
        t1 = timeit(f_stk, (params, cube, seeds))
        log(f"batch {b}: tree-indexed {t0*1e3:7.1f} ms | stacked {t1*1e3:7.1f} ms "
            f"(delta {(t0-t1)*1e3:+6.1f} ms)")
    # numeric check
    cube = jax.random.normal(rng, (2, 128, 64, 32, 3), jnp.float32)
    seeds = jnp.arange(2)
    a = np.asarray(f_tree(params, cube, seeds), np.float32)
    b_ = np.asarray(f_stk(params, cube, seeds), np.float32)
    log(f"max|a-b|={np.abs(a-b_).max():.6f}")


if __name__ == "__main__":
    main()
