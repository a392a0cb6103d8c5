"""A/B the fused self-attention sublayer kernel in the real sampler chain.

Run: PYTHONPATH=/root/repo python scripts/perf_probe3.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.config import Config
from rald_tpu.diffusion.edm import edm_sampler, karras_sigmas, sample_prior_latents
from rald_tpu.models.registry import get_ae_model, get_generation_model


def log(*a):
    print(*a, flush=True)


def sync(out):
    return np.asarray(out[(slice(0, 1),) * out.ndim])


def timeit(fn, args, iters=3, pipeline=1):
    sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / pipeline)
    return min(times)


def cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree
    )


MC = Config(
    cond_type="radar", use_radar_cond=True, use_radar_enc=True,
    unfreeze_radar_enc=True, radar_token_channel=512,
    enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
    enc_radar_ch=16, enc_hidden_ch=64,
)


def build_sampler(use_fused_ff, use_fused_attn):
    model = get_generation_model(
        "kl_d512_m512_l32_d24_edm", MC, dtype=jnp.bfloat16,
        use_fused_ff=use_fused_ff, use_fused_attn=use_fused_attn,
    )
    rng = jax.random.PRNGKey(0)
    params = cast_bf16(model.init(
        rng, jnp.zeros((1, 512, 32), jnp.float32), jnp.ones((1,)),
        jnp.zeros((1, 128, 64, 32, 3), jnp.float32),
    )["params"])

    def sample(params, cube, seeds):
        cond = model.apply({"params": params}, cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)
        t_steps = karras_sigmas(18)
        table = model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")

        def denoise_indexed(x, sigma, idx):
            mods = jax.tree_util.tree_map(lambda a: a[idx], table)
            return model.apply(
                {"params": params}, x, sigma, mods, cond, method="denoise_with_mods"
            )

        return edm_sampler(lambda x, s: None, latents, denoise_indexed=denoise_indexed)

    return jax.jit(sample), params


def main():
    log(f"device: {jax.devices()[0]}")
    rng = jax.random.PRNGKey(1)

    fn0, p0 = build_sampler(True, False)
    fn1, p1 = build_sampler(True, True)

    for b in (8, 16):
        cube = jax.random.normal(rng, (b, 128, 64, 32, 3), jnp.float32)
        seeds = jnp.arange(b)
        t0 = timeit(fn0, (p0, cube, seeds))
        t1 = timeit(fn1, (p1, cube, seeds))
        log(f"batch {b}: fusedff {t0*1e3:7.1f} ms | +fusedattn {t1*1e3:7.1f} ms "
            f"(delta {(t0-t1)*1e3:+6.1f} ms)")

    # numeric check (same params: p0 tree == p1 tree structurally)
    cube = jax.random.normal(rng, (2, 128, 64, 32, 3), jnp.float32)
    seeds = jnp.arange(2)
    a = np.asarray(fn0(p0, cube, seeds), np.float32)
    b_ = np.asarray(fn1(p0, cube, seeds), np.float32)
    d = np.abs(a - b_)
    log(f"tokens: max|a-b|={d.max():.4f} mean|a|={np.abs(a).mean():.4f} "
        f"corr={np.corrcoef(a.ravel(), b_.ravel())[0,1]:.6f}")


if __name__ == "__main__":
    main()
