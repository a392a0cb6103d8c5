"""Probe: stage attribution at the shipped operating point (batch 32, int8).

Round 2's attribution (docs/DESIGN.md "Stage attribution") was taken at
batch 8 / bf16, before the int8 kernels, the decode folds, and the batch-32
operating point landed. This probe re-measures where each millisecond of the
28 pc/s chain goes, at the exact configuration bench.py ships:

  stage 1: process_radar_cond (3D-CNN encoder + token proj + pos-emb)
  stage 2: 35-NFE EDM Heun sampler (int8 FF + 'vout' int8 self-attn)
  stage 3: VAE decode_latents (24-block self-attn stack over 512 tokens)
  stage 4: streamed 500k-query folded decode tail

plus the full fused chain for cross-checking (stages are timed as separate
jits, so their sum carries per-dispatch overhead the fused chain avoids).

Timing discipline per docs/DESIGN.md measurement traps: warm compile first,
tiny numpy readback to force completion (block_until_ready is a no-op on the
axon tunnel), min over reps with 4-deep dispatch pipelining.

Run: PYTHONPATH=/root/repo python scripts/perf_probe_attrib.py [batch]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, pipeline=4, sync):
    sync(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    sys.path.insert(0, "/root/repo")
    import bench
    from rald_tpu.diffusion.edm import (
        edm_sampler, karras_sigmas, sample_prior_latents, stack_mod_table,
        unstack_mods,
    )
    from rald_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}, batch {batch}", file=sys.stderr)

    fn, model, params, vae_params, num_queries = bench.build()

    rng = jax.random.PRNGKey(1)
    cube = jax.random.normal(rng, (batch, 128, 64, 32, 3), jnp.float32)
    queries = jax.random.uniform(
        jax.random.fold_in(rng, 1), (batch, num_queries, 3), jnp.float32, -1, 1
    )
    seeds = jnp.arange(batch)

    def sync_bool(out):
        return np.asarray(out[:, 0])

    def sync_f(out):
        return np.asarray(jnp.ravel(out)[:1])

    from rald_tpu.models.registry import get_ae_model

    on_tpu = jax.default_backend() == "tpu"
    vae_model = get_ae_model(
        "kl_d512_m512_l32_mix", N=10000, dtype=jnp.bfloat16,
        fold_decode_tail=True, use_fused_ff=on_tpu,
    )

    variables = {"params": params}
    if model.use_int8_ff or model.use_int8_attn:
        from rald_tpu.ops.attn_kernel import merge_int8_trees, quantize_attn_tree
        from rald_tpu.ops.geglu_kernel import quantize_ff_tree

        int8 = quantize_ff_tree(params) if model.use_int8_ff else {}
        if model.use_int8_attn:
            int8 = merge_int8_trees(int8, quantize_attn_tree(params))
        variables = {"params": params, "int8": int8}

    # --- stage 1: conditioning
    cond_fn = jax.jit(
        lambda v, c: model.apply(v, c, method="process_radar_cond"))
    t_cond = timed(cond_fn, variables, cube, sync=sync_f)

    # --- stage 2: sampler (cond precomputed, like the chain)
    cond = cond_fn(variables, cube)

    @jax.jit
    def sampler_fn(variables, cond, seeds):
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)
        t_steps = karras_sigmas(18)
        table = stack_mod_table(
            model.apply(variables, t_steps[:-1], method="compute_mod_table")
        )

        def denoise_indexed(x, sigma, idx):
            mods = unstack_mods(table[idx])
            return model.apply(variables, x, sigma, mods, cond,
                               method="denoise_with_mods")

        return edm_sampler(lambda x, s: None, latents,
                           denoise_indexed=denoise_indexed)

    t_sampler = timed(sampler_fn, variables, cond, seeds, sync=sync_f)
    tokens = sampler_fn(variables, cond, seeds)

    # --- stage 3: decoder token stack (24 self-attn blocks over 512 tokens)
    stack_fn = jax.jit(
        lambda p, t: vae_model.apply({"params": p}, t, method="decode_latents")
    )
    t_stack = timed(stack_fn, vae_params, tokens, sync=sync_f)
    dec_tokens = stack_fn(vae_params, tokens)

    # --- stage 4: streamed folded query decode (500k queries)
    tail_fn = jax.jit(
        lambda p, t, q: vae_model.apply({"params": p}, t, q,
                                        method="decode_queries")
    )
    t_tail = timed(tail_fn, vae_params, dec_tokens, queries, sync=sync_f)

    # --- full fused chain (the bench program, already cached)
    t_chain = timed(fn, params, vae_params, cube, queries, seeds, sync=sync_bool)

    rows = [
        ("cond (3D-CNN + tokens)", t_cond),
        ("sampler (35 NFE, int8)", t_sampler),
        ("VAE token stack (24 blocks)", t_stack),
        ("query decode tail (500k, folded)", t_tail),
    ]
    total = sum(t for _, t in rows)
    print(f"\nstage attribution, batch {batch} "
          f"(separate jits; sum != fused chain by dispatch overhead):")
    for name, t in rows:
        print(f"  {name:36s} {t*1000:8.1f} ms/batch  "
              f"{t*1000/batch:6.2f} ms/frame  {100*t/total:5.1f}%")
    print(f"  {'sum of stages':36s} {total*1000:8.1f} ms/batch  "
          f"{total*1000/batch:6.2f} ms/frame")
    print(f"  {'fused chain (bench program)':36s} {t_chain*1000:8.1f} ms/batch  "
          f"{t_chain*1000/batch:6.2f} ms/frame  -> {batch/t_chain:.2f} pc/s")


if __name__ == "__main__":
    main()
