"""Headline benchmark: radar spectrum -> dense point cloud, per-chip throughput.

Measures the reference's product path (BASELINE.md: "point clouds/sec/chip
(spectrum -> PC e2e)") on one TPU chip with the full-size models:

  radar cube (128,64,32,3) -> in-graph 3D-CNN conditioning -> 35-NFE EDM Heun
  sampling of 512x32 latent tokens (depth-24 dim-512 DiT, cond tokens
  computed once) -> streamed decode of 500k occupancy queries -> threshold.

The whole chain is ONE jitted program per batch size (the reference evaluates
at batch 1, engine_generation.py eval_batch_size; batching is free capability
on TPU). Throughput is measured steady-state with 4 batches in flight
(dispatch latency overlaps device compute); the single-dispatch latency
(pipeline=1) is also logged to stderr so round-over-round comparisons can
separate methodology from real speedups.

Robustness to the driver's wall-clock budget (round-2 lesson: BENCH_r02 was
timeout-killed before its single end-of-run JSON print):
  - the known-best batch size is measured FIRST;
  - the JSON result line is printed immediately after the first successful
    measurement and RE-printed (updated best) after each further batch size —
    the driver parses the last line, so a timeout can never erase the result;
  - remaining batch sizes and the secondary sampler-only metric are skipped
    once a self-imposed elapsed-time guard trips;
  - compiles hit the persistent XLA cache (~/.cache/rald_tpu/xla), primed by
    running this script once at the end of each round.

Round-2/3 optimizations (measured in scripts/perf_probe*.py, docs/DESIGN.md):
  - params pre-cast to bf16 (decode -17%: halves weight HBM re-reads).
    The product eval path applies the same cast when
    ``eval.cast_params_bf16`` is set (gen_engine), so this lever is not
    bench-only.
  - folded decode tail (decode -25%: values/out-proj/occupancy head collapse
    into a (M,1) folded value vector -> one matvec per query chunk)
  - Pallas fused LN/AdaLN-mod + GEGLU FF + residual in the DiT blocks
    (sampler -15%: the (tokens, 4096) projection + gated product stay in
    VMEM instead of HBM), and the same FF fusion in the VAE blocks
  - int8 quantized inference for the DiT FF + self-attn projections
    (chain +14%: MXU double-rate 8-bit mode; static per-column weight
    scales + dynamic per-token activation scales). Mirrors the product
    path's ``eval.inference.int8_ff / int8_attn``; quality-gated on
    synthetic data at the epoch-119/480 rerun checkpoint, ΔIoU <= 0.005
    (docs/DESIGN.md "Round 3 int8 gate, reproduced")
  - AdaLN mod tables indexed by schedule step at every batch size

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md) and
CUDA hardware is unavailable here, so the baseline is a documented
FLOP-model estimate of the reference implementation on its target GPU
(A100-class): ~5.4 TFLOP/frame (35 NFEs x ~135 GFLOP DiT forward + ~0.9
TFLOP 500k-query decode) at ~30% bf16 utilization of 312 TFLOPs ~= 17 ms
compute but torch eager at batch 1 observed-style ~5.5 frames/s. Ratio > 1
means faster than that estimate; it is NOT a measured win over the
reference on its own hardware.

Prints one JSON line per completed batch size on stdout; the last line is
the final (best) result.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_GPU_PC_PER_SEC_EST = 5.5  # frames/s, documented estimate (see docstring)

# Measured-best first. Sweep with every decode fold, 8-deep pipelining, and
# the poly-GELU int8 kernel in place (docs/artifacts/bench_r3f.log):
# 1 -> 23.73, 8 -> 28.62, 16 -> 29.70, 24 -> 30.22, 32 -> 30.47,
# 48 -> 30.53 pc/s — the curve plateaus at ~30.5 over batch 32-48 (the
# round-2 "batch-32 sampler regression" washed out once the decode folds
# landed). 32 first (fastest to confirm), 48 second (statistically tied
# best); the rest refine under the wall guard.
BATCH_ORDER = (32, 48, 24, 16, 8, 1)
# Stop starting new work past this point; the driver kills us at ~15-18 min.
# Overridable so a long cache-priming run (which compiles every batch size
# into the persistent XLA cache for the driver's subsequent timed run) can
# lift the guard: RALD_BENCH_WALL_GUARD_S=3600 python bench.py
WALL_GUARD_S = float(os.environ.get("RALD_BENCH_WALL_GUARD_S", "480"))

T_START = time.perf_counter()


def elapsed():
    return time.perf_counter() - T_START


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(best_pc_per_sec):
    print(json.dumps({
        "metric": "point_clouds_per_sec_per_chip",
        "value": round(best_pc_per_sec, 3),
        "unit": "pc/s (spectrum->500k-query point cloud, 35-NFE EDM)",
        "vs_baseline": round(best_pc_per_sec / REFERENCE_GPU_PC_PER_SEC_EST, 3),
    }), flush=True)


def build():
    from rald_tpu.config import Config
    from rald_tpu.models.registry import get_ae_model, get_generation_model
    from rald_tpu.diffusion.edm import (
        edm_sampler, karras_sigmas, sample_prior_latents, stack_mod_table, unstack_mods,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16
    mc = Config(
        cond_type="radar", use_radar_cond=True, use_radar_enc=True,
        unfreeze_radar_enc=True, radar_token_channel=512,
        enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
        enc_radar_ch=16, enc_hidden_ch=64,
    )
    model = get_generation_model(
        "kl_d512_m512_l32_d24_edm", mc, dtype=dtype, use_fused_ff=on_tpu
    )
    if on_tpu:
        # quantized inference (eval.inference.int8_ff/int8_attn in the
        # product path) — the 'vout' attn mode keeps q/k bf16: on the
        # trained 480-epoch checkpoint it is quality-neutral (IoU 0.642 vs
        # bf16 0.643) where full-attn int8 costs -0.012 IoU (docs/DESIGN.md).
        # RALD_BENCH_INT8=static selects the calibrated-activation-scale FF
        # kernel (eval.inference.int8_ff: "static" in the product path —
        # throughput is scale-value-independent, so the bench feeds a
        # constant table; quality is gated separately on the trained
        # checkpoint by scripts/int8_gate.py).
        int8_ff = os.environ.get("RALD_BENCH_INT8", "dynamic")
        assert int8_ff in ("dynamic", "static"), int8_ff
        model = model.copy(
            use_int8_ff=True if int8_ff == "dynamic" else "static",
            use_int8_attn="vout",
        )
    vae = get_ae_model(
        "kl_d512_m512_l32_mix", N=10000, dtype=dtype, fold_decode_tail=True,
        use_fused_ff=on_tpu,
    )

    # Host-side init: running the real flax init would jit-compile two more
    # full-size XLA programs (minutes each on a cold cache) just to produce
    # values — but TPU throughput is value-independent (no sparsity
    # short-circuits), so eval_shape the param structure and fill it with
    # small host randoms instead. Cuts the cold-cache build phase from
    # ~7 min to the trace time.
    import numpy as np

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 512, 32), jnp.float32)
    cube0 = jnp.zeros((1, 128, 64, 32, 3), jnp.float32)
    pc0 = jnp.zeros((1, 10000, 3), jnp.float32)
    q0 = jnp.zeros((1, 64, 3), jnp.float32)

    host_rng = np.random.default_rng(0)

    def host_init(tree_shapes):
        def leaf(s):
            # same policy as the product path's cast_params_bf16: f32 params
            # ride as bf16, others keep their dtype
            target = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            a = host_rng.standard_normal(s.shape, dtype=np.float32) * 0.02
            return jnp.asarray(a.astype(target))

        return jax.tree_util.tree_map(leaf, tree_shapes)

    params = host_init(
        jax.eval_shape(model.init, rng, x0, jnp.ones((1,)), cube0)["params"]
    )
    vae_params = host_init(
        jax.eval_shape(
            vae.init, {"params": rng, "latent": jax.random.fold_in(rng, 1)}, pc0, q0
        )["params"]
    )

    num_queries = 500_000

    def spectrum_to_pc(params, vae_params, cube, queries, seeds):
        variables = {"params": params}
        if model.use_int8_ff or model.use_int8_attn:
            # static weight quantization runs ONCE here, outside the scan
            from rald_tpu.ops.attn_kernel import merge_int8_trees, quantize_attn_tree
            from rald_tpu.ops.geglu_kernel import quantize_ff_tree

            int8 = quantize_ff_tree(params) if model.use_int8_ff else {}
            if model.use_int8_attn:
                int8 = merge_int8_trees(int8, quantize_attn_tree(params))
            variables = {"params": params, "int8": int8}
        cond = model.apply(variables, cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)

        # the Heun schedule's sigmas are fixed: precompute every block's
        # AdaLN modulations once and index by schedule step inside the scan
        t_steps = karras_sigmas(18)
        table = stack_mod_table(
            model.apply(variables, t_steps[:-1], method="compute_mod_table")
        )

        act_table = None
        if model.use_int8_ff == "static":
            # constant calibration stand-in (see build() comment): shape and
            # per-step indexing identical to the engine's real table
            act_table = jnp.full(
                (t_steps.shape[0] - 1, model.depth, 2), 4.0, jnp.float32
            )

        def denoise_indexed(x, sigma, idx):
            mods = unstack_mods(table[idx])
            sc = None
            if act_table is not None:
                row = act_table[idx]
                sc = tuple((row[i, 0], row[i, 1]) for i in range(row.shape[0]))
            return model.apply(
                variables, x, sigma, mods, cond, method="denoise_with_mods",
                act_scales=sc,
            )

        tokens = edm_sampler(lambda x, s: None, latents, denoise_indexed=denoise_indexed)
        logits = vae.apply({"params": vae_params}, tokens, queries, method="decode")
        return jnp.squeeze(logits, -1) > 0

    fn = jax.jit(spectrum_to_pc)
    return fn, model, params, vae_params, num_queries


def _sync(out):
    """Force completion with a tiny readback (one bool per frame):
    ``block_until_ready`` is unreliable on tunneled/experimental backends."""
    import numpy as np

    return np.asarray(out[:, 0])


def bench_batch(fn, params, vae_params, num_queries, batch, iters=3, pipeline=8):
    rng = jax.random.PRNGKey(1)
    cube = jax.random.normal(rng, (batch, 128, 64, 32, 3), jnp.float32)
    queries = jax.random.uniform(
        jax.random.fold_in(rng, 1), (batch, num_queries, 3), jnp.float32, -1, 1
    )
    seeds = jnp.arange(batch)
    _sync(fn(params, vae_params, cube, queries, seeds))  # compile + warmup
    # single-dispatch latency (pre-round-2 methodology), for comparability
    t0 = time.perf_counter()
    _sync(fn(params, vae_params, cube, queries, seeds))
    lat = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(params, vae_params, cube, queries, seeds)
        _sync(out)
        times.append((time.perf_counter() - t0) / pipeline)
    dt = min(times)
    return batch / dt, dt, lat


def bench_sampler_only(model, params):
    """Secondary metric (stderr only): batched Heun NFEs/s, reusing the
    chain's model and params (no second model build)."""
    import numpy as np

    from rald_tpu.diffusion.edm import edm_sampler, sample_prior_latents

    rng = jax.random.PRNGKey(0)
    extra = {}
    if model.use_int8_ff or model.use_int8_attn:
        # match the chain's int8 operating point (absent the collection the
        # model silently falls back to bf16 and this metric would mismeasure)
        from rald_tpu.ops.attn_kernel import merge_int8_trees, quantize_attn_tree
        from rald_tpu.ops.geglu_kernel import quantize_ff_tree

        int8 = quantize_ff_tree(params) if model.use_int8_ff else {}
        if model.use_int8_attn:
            int8 = merge_int8_trees(int8, quantize_attn_tree(params))
        extra = {"int8": int8}
    cond = model.apply({"params": params, **extra},
                       jax.random.normal(rng, (8, 128, 64, 32, 3)),
                       method="process_radar_cond")
    samp = jax.jit(lambda p, c, s: edm_sampler(
        lambda x, sg: model.apply({"params": p, **extra}, x, sg, c, method="denoise"),
        sample_prior_latents(s, model.n_latents, model.channels)))
    seeds = jnp.arange(8)
    np.asarray(samp(params, cond, seeds)[:1, :1, :1])
    t0 = time.perf_counter()
    np.asarray(samp(params, cond, seeds)[:1, :1, :1])
    dt = time.perf_counter() - t0
    log(f"sampler: {35 / dt:.1f} batched Heun NFEs/s at batch 8 "
        f"({8 * 35 / dt:.0f} sample-NFEs/s)")


def main():
    from rald_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    log(f"device: {dev}")
    fn, model, params, vae_params, num_queries = build()
    log(f"build done at {elapsed():.0f}s")

    best = 0.0
    for batch in BATCH_ORDER:
        if best > 0 and elapsed() > WALL_GUARD_S:
            log(f"wall guard ({elapsed():.0f}s > {WALL_GUARD_S:.0f}s): "
                f"skipping batch {batch} and beyond")
            break
        try:
            pc_per_sec, dt, lat = bench_batch(fn, params, vae_params, num_queries, batch)
            log(f"batch {batch}: {dt*1000:.1f} ms/batch steady-state "
                f"({lat*1000:.1f} ms single-dispatch) -> {pc_per_sec:.2f} pc/s "
                f"[t={elapsed():.0f}s]")
            if pc_per_sec > best:
                best = pc_per_sec
            emit(best)
        except Exception as e:  # OOM at large batch should not kill the bench
            log(f"batch {batch} failed: {e}")

    if best > 0 and elapsed() <= WALL_GUARD_S:
        try:
            if model.use_int8_ff == "static":
                # denoise() without act_scales falls back to the dynamic
                # kernel — the secondary metric would silently mismeasure
                log("sampler-only metric skipped in static-int8 mode")
            else:
                bench_sampler_only(model, params)
        except Exception as e:
            log(f"sampler-only metric failed: {e}")

    if best > 0:
        emit(best)


if __name__ == "__main__":
    main()
