"""One-off TPU measurements for the round-2 perf push (VERDICT.md #2).

Measures the bench.py chain (spectrum -> 500k-query point cloud) under
incremental optimizations:

  A. params pre-cast to bf16 (halves per-NFE weight HBM traffic: the scan
     re-reads all ~163M DiT params every NFE; f32 = 652 MB/NFE)
  B. folded decode tail (values/out-proj/occupancy-head collapse)
  C. AdaLN mod table indexed at ALL batch sizes (not just batch 1)

then sweeps batch sizes and measures pipelined (4-deep) dispatch.

Run on the real TPU:  python scripts/perf_probe.py 2>&1 | tee /tmp/probe.log
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.config import Config
from rald_tpu.diffusion.edm import edm_sampler, karras_sigmas, sample_prior_latents
from rald_tpu.models.registry import get_ae_model, get_generation_model

NUM_QUERIES = 500_000


def log(*a):
    print(*a, flush=True)


def sync(out):
    return np.asarray(out[(slice(0, 1),) * out.ndim])


def timeit(fn, args, iters=3, pipeline=1):
    sync(fn(*args))  # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / pipeline)
    return min(times)


def build(fold=False, indexed=False):
    mc = Config(
        cond_type="radar", use_radar_cond=True, use_radar_enc=True,
        unfreeze_radar_enc=True, radar_token_channel=512,
        enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
        enc_radar_ch=16, enc_hidden_ch=64,
    )
    dtype = jnp.bfloat16
    model = get_generation_model("kl_d512_m512_l32_d24_edm", mc, dtype=dtype)
    vae = get_ae_model("kl_d512_m512_l32_mix", N=10000, dtype=dtype, fold_decode_tail=fold)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 512, 32), jnp.float32)
    cube0 = jnp.zeros((1, 128, 64, 32, 3), jnp.float32)
    params = model.init(rng, x0, jnp.ones((1,)), cube0)["params"]
    pc0 = jnp.zeros((1, 10000, 3), jnp.float32)
    q0 = jnp.zeros((1, 64, 3), jnp.float32)
    vae_params = vae.init({"params": rng, "latent": jax.random.fold_in(rng, 1)}, pc0, q0)["params"]

    def spectrum_to_pc(params, vae_params, cube, queries, seeds):
        cond = model.apply({"params": params}, cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)
        if indexed:
            t_steps = karras_sigmas(18)
            table = model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")

            def denoise_indexed(x, sigma, idx):
                mods = jax.tree_util.tree_map(lambda a: a[idx], table)
                return model.apply(
                    {"params": params}, x, sigma, mods, cond, method="denoise_with_mods"
                )

            tokens = edm_sampler(lambda x, s: None, latents, denoise_indexed=denoise_indexed)
        else:
            def denoise(x, sigma):
                return model.apply({"params": params}, x, sigma, cond, method="denoise")

            tokens = edm_sampler(denoise, latents)
        logits = vae.apply({"params": vae_params}, tokens, queries, method="decode")
        return jnp.squeeze(logits, -1) > 0

    def sample_only(params, cube, seeds):
        cond = model.apply({"params": params}, cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)
        if indexed:
            t_steps = karras_sigmas(18)
            table = model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")

            def denoise_indexed(x, sigma, idx):
                mods = jax.tree_util.tree_map(lambda a: a[idx], table)
                return model.apply(
                    {"params": params}, x, sigma, mods, cond, method="denoise_with_mods"
                )

            return edm_sampler(lambda x, s: None, latents, denoise_indexed=denoise_indexed)
        def denoise(x, sigma):
            return model.apply({"params": params}, x, sigma, cond, method="denoise")
        return edm_sampler(denoise, latents)

    def decode_only(vae_params, tokens, queries):
        return vae.apply({"params": vae_params}, tokens, queries, method="decode")

    return model, vae, params, vae_params, jax.jit(spectrum_to_pc), jax.jit(sample_only), jax.jit(decode_only)


def inputs(batch, nq=NUM_QUERIES):
    rng = jax.random.PRNGKey(1)
    cube = jax.random.normal(rng, (batch, 128, 64, 32, 3), jnp.float32)
    queries = jax.random.uniform(jax.random.fold_in(rng, 1), (batch, nq, 3), jnp.float32, -1, 1)
    seeds = jnp.arange(batch)
    tokens = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 512, 32), jnp.float32)
    return cube, queries, seeds, tokens


def cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree
    )


def main():
    log(f"device: {jax.devices()[0]}")
    B = 8
    cube, queries, seeds, tokens = inputs(B)

    # ---- stage attribution at batch 8, incremental variants ----
    log("\n== variants at batch 8 (full chain / sampler-only / decode-only) ==")
    results = {}
    # (the round-2 "+flash" variant was removed after measuring the stock
    # pallas flash kernel 1.85x slower at these shapes; see docs/DESIGN.md)
    for name, kw, bf16 in [
        ("base           ", dict(), False),
        ("+bf16params    ", dict(), True),
        ("+fold          ", dict(fold=True), True),
        ("+indexed       ", dict(fold=True, indexed=True), True),
    ]:
        model, vae, params, vae_params, chain, samp, dec = build(**kw)
        if bf16:
            params = cast_bf16(params)
            vae_params = cast_bf16(vae_params)
        t_chain = timeit(chain, (params, vae_params, cube, queries, seeds))
        t_samp = timeit(samp, (params, cube, seeds))
        t_dec = timeit(dec, (vae_params, tokens, queries))
        results[name] = (t_chain, t_samp, t_dec)
        log(f"{name} chain {t_chain*1e3:7.1f} ms  sampler {t_samp*1e3:7.1f} ms  "
            f"decode {t_dec*1e3:7.1f} ms  -> {B/t_chain:6.2f} pc/s")

    # ---- correctness spot-check: fold vs base (same params dtype) ----
    log("\n== fold numeric check vs base (bf16 params both) ==")
    _, _, p0, vp0, chain0, _, dec0 = build()
    _, _, _, _, chainX, _, decX = build(fold=True)
    p0b, vp0b = cast_bf16(p0), cast_bf16(vp0)
    a = np.asarray(dec0(vp0b, tokens, queries[:, :4096]))
    b = np.asarray(decX(vp0b, tokens, queries[:, :4096]))
    a = a.astype(np.float32); b = b.astype(np.float32)
    log(f"decode logits: max|a-b|={np.abs(a-b).max():.4f}  mean|a|={np.abs(a).mean():.4f}  "
        f"occupancy agree={np.mean((a>0)==(b>0))*100:.3f}%")

    # ---- batch sweep with the best combo ----
    log("\n== batch sweep (fold+indexed, bf16 params) ==")
    model, vae, params, vae_params, chain, samp, dec = build(fold=True, indexed=True)
    params, vae_params = cast_bf16(params), cast_bf16(vae_params)
    for b in (1, 8, 12, 16, 24, 32):
        cu, qu, se, _ = inputs(b)
        try:
            t = timeit(chain, (params, vae_params, cu, qu, se))
            tp = timeit(chain, (params, vae_params, cu, qu, se), iters=2, pipeline=4)
            log(f"batch {b:3d}: {t*1e3:7.1f} ms -> {b/t:6.2f} pc/s   "
                f"pipelined(4): {tp*1e3:7.1f} ms -> {b/tp:6.2f} pc/s")
        except Exception as e:
            log(f"batch {b:3d}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
