"""Sampler attribution probe: where do 11.4 ms/NFE go (5.3 ms is FLOP-bound)?

Times the 35-NFE scan with sublayers knocked out (self-attn / cross-attn /
FF / AdaLN), plus decode chunk-size and batch sweeps WITHOUT flash (probe 1
measured the Pallas flash kernel 1.85x SLOWER at these shapes).

Run: PYTHONPATH=/root/repo python scripts/perf_probe2.py
"""
from __future__ import annotations

import time
from functools import partial

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


B = 8
DEPTH = 24
INNER = 512


def tower_scan(params, x0, cond, mods_table, skip, ff_block=0, invariant_kv=False):
    """35 evals of a DiT forward with optional sublayer knockouts, via the
    same flax params tree (manual forward, einsum attention)."""
    p = params["model"]

    def ln(x):  # no-scale/bias LN (AdaLayerNorm's inner ln)
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.mean(jnp.square(x), -1, keepdims=True) - jnp.square(m)
        return (x - m) * jax.lax.rsqrt(v + 1e-5)

    def attn(bp, x, ctx):
        q = x @ bp["to_q"]["kernel"]
        k = ctx @ bp["to_k"]["kernel"]
        v = ctx @ bp["to_v"]["kernel"]
        q = q.reshape(*q.shape[:-1], 8, 64)
        k = k.reshape(*k.shape[:-1], 8, 64)
        v = v.reshape(*v.shape[:-1], 8, 64)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (64**-0.5)
        a = jax.nn.softmax(sim.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(*x.shape[:-1], INNER)
        return o @ bp["to_out"]["kernel"] + bp["to_out"]["bias"]

    def ff(bp, x):
        if ff_block:
            from rald_tpu.ops.geglu_kernel import geglu_ff

            return geglu_ff(
                x, bp["proj_in"]["kernel"], bp["proj_in"]["bias"],
                bp["proj_out"]["kernel"], bp["proj_out"]["bias"], block=ff_block,
            )
        h = x @ bp["proj_in"]["kernel"] + bp["proj_in"]["bias"]
        h, g = jnp.split(h, 2, -1)
        h = h * jax.nn.gelu(g, approximate=False)
        return h @ bp["proj_out"]["kernel"] + bp["proj_out"]["bias"]

    def attn_pre_kv(bp, x, k, v):
        q = (x @ bp["to_q"]["kernel"]).reshape(*x.shape[:-1], 8, 64)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (64**-0.5)
        a = jax.nn.softmax(sim.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(*x.shape[:-1], INNER)
        return o @ bp["to_out"]["kernel"] + bp["to_out"]["bias"]

    if invariant_kv:
        cross_kv = []
        for i in range(DEPTH):
            bp = p[f"block_{i}"]["attn2"]
            k = (cond @ bp["to_k"]["kernel"]).reshape(*cond.shape[:-1], 8, 64)
            v = (cond @ bp["to_v"]["kernel"]).reshape(*cond.shape[:-1], 8, 64)
            cross_kv.append((k, v))

    def forward(x, step_idx):
        h = x @ p["proj_in"]["kernel"]
        for i in range(DEPTH):
            bp = p[f"block_{i}"]
            m1, m2, m3 = (
                jax.tree_util.tree_map(lambda a: a[step_idx], mods_table[f"block_{i}"][k2])
                for k2 in ("m1", "m2", "m3")
            )
            if "self" not in skip:
                hh = ln(h) * (1 + m1[0]) + m1[1]
                h = h + attn(bp["attn1"], hh, hh)
            if "cross" not in skip:
                hh = ln(h) * (1 + m2[0]) + m2[1]
                if invariant_kv:
                    h = h + attn_pre_kv(bp["attn2"], hh, *cross_kv[i])
                else:
                    h = h + attn(bp["attn2"], hh, cond)
            if "ff" not in skip:
                h = h + ff(bp["ff"], ln(h) * (1 + m3[0]) + m3[1])
        ip = p["norm"]
        hn = ln(h) * ip["scale"] + ip["bias"]
        return hn @ p["proj_out"]["kernel"]

    def step(x, i):
        x = x + 0.01 * forward(x, i)
        return x, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(35) % 17)
    return x


def build_tower_params(rng, model_params):
    """Adapt real flax DiT params + a mods table for the manual forward."""
    p = model_params["model"]
    table = {}
    for i in range(DEPTH):
        bp = p[f"block_{i}"]
        ms = {}
        for j, nm in ((1, "m1"), (2, "m2"), (3, "m3")):
            w = bp[f"norm{j}"]["mod"]
            # 17 schedule sigmas -> (17, 1, 1, dim) scale/shift tables
            temb = jax.random.normal(rng, (17, 1, 512))
            mod = temb @ w["kernel"] + w["bias"]
            s, b = jnp.split(mod, 2, -1)
            ms[nm] = (s[:, None], b[:, None])
        table[f"block_{i}"] = ms
    return table


def main():
    log(f"device: {jax.devices()[0]}")
    mc = Config(
        cond_type="radar", use_radar_cond=True, use_radar_enc=True,
        unfreeze_radar_enc=True, radar_token_channel=512,
        enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
        enc_radar_ch=16, enc_hidden_ch=64,
    )
    model = get_generation_model("kl_d512_m512_l32_d24_edm", mc, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, 512, 32), jnp.float32), jnp.ones((1,)),
        jnp.zeros((1, 128, 64, 32, 3), jnp.float32),
    )["params"]
    params = cast_bf16(params)

    mods_table = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), build_tower_params(rng, params)
    )
    tp = {"model": params["model"]}
    x0 = jax.random.normal(rng, (B, 512, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, 64, INNER), jnp.bfloat16)

    log("\n== sampler towers: 35 manual NFEs at batch 8, knockout timing ==")
    base_t = None
    for name, kw in [
        ("full", dict(skip=())),
        ("-self", dict(skip=("self",))),
        ("-cross", dict(skip=("cross",))),
        ("-ff", dict(skip=("ff",))),
        ("-all3", dict(skip=("self", "cross", "ff"))),
        ("full+fusedff256", dict(skip=(), ff_block=256)),
        ("full+fusedff512", dict(skip=(), ff_block=512)),
        ("full+invKV", dict(skip=(), invariant_kv=True)),
        ("full+both", dict(skip=(), ff_block=512, invariant_kv=True)),
    ]:
        fn = jax.jit(partial(tower_scan, **kw))
        try:
            t = timeit(fn, (tp, x0, cond, mods_table))
        except Exception as e:
            log(f"{name:18s} FAILED {type(e).__name__}: {e}")
            continue
        extra = "" if base_t is None else f"  (delta {(base_t-t)*1e3:+6.1f} ms)"
        if base_t is None:
            base_t = t
        log(f"{name:18s} {t*1e3:7.1f} ms{extra}")

    # ---- decode chunk-size sweep (fold on, bf16 params) ----
    log("\n== decode chunk sweep (fold on, bf16 params, batch 8 x 500k) ==")
    rngi = jax.random.PRNGKey(1)
    tokens = jax.random.normal(rngi, (B, 512, 32), jnp.float32)
    queries = jax.random.uniform(jax.random.fold_in(rngi, 1), (B, 500_000, 3), jnp.float32, -1, 1)
    from rald_tpu.models.vecset_vae import VecSetVAE

    for chunk in (32768, 65536, 131072, 262144):
        vae = VecSetVAE(
            depth=24, dim=512, queries_dim=512, output_dim=1, num_inputs=10000,
            num_latents=512, latent_dim=32, heads=8, dim_head=64, query_type="mix",
            fold_decode_tail=True, query_chunk=chunk, dtype=jnp.bfloat16,
        )
        vp = vae.init({"params": rngi, "latent": jax.random.fold_in(rngi, 2)},
                      jnp.zeros((1, 10000, 3)), jnp.zeros((1, 64, 3)))["params"]
        vp = cast_bf16(vp)
        fn = jax.jit(lambda vp, t, q, _vae=vae: _vae.apply({"params": vp}, t, q, method="decode"))
        t = timeit(fn, (vp, tokens, queries))
        log(f"chunk {chunk:7d}: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
