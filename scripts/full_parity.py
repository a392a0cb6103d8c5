"""Full-size composed end-to-end parity vs the reference's own torch code.

VERDICT r3 "Next round" #1: the tiny-model engine composition
(tests/test_reference_parity.py::test_e2e_chain) and the full-size
*individual* forwards (:116, :196) are proven, but the composed multi-NFE
chain at dim-512 / depth-24 had never been diffed — accumulation-order
drift over repeated Heun steps at full width is exactly where a subtle
numerics bug would hide from both existing test tiers.

This script composes the product engines at FULL width against the
reference's own ``edm_sampler`` + ``vae.decode``
(engine_generation.py:195,274-277 + models_radar_generation.py:235-275):

- ``kl_d512_m512_l32_d24_edm`` (184M params, in-graph radar encoder on a
  full (128, 64, 32, 3) cube) + ``kl_d512_m512_l32_mix`` (106M params),
  seeded random torch weights converted with rald_tpu.convert.torch_ckpt;
- identical injected prior noise (our ``sample_prior_latents`` stream
  replayed through the reference sampler's ``latents`` argument — with
  S_churn = 0 the chain is then deterministic on both sides);
- ``num_steps = 4`` -> 7 NFEs on BOTH sides: the same scan/Heun code path
  as the product 18/35, cut down because torch CPU needs ~47 s per
  full-size NFE on this box (which is why this is an archived-artifact
  script rather than a default-suite test);
- 50k uniform queries through the folded fast-inference decode.

Both sides run f32 (engine ``compute_dtype: float32``) so the comparison
isolates implementation/accumulation-order differences from bf16 rounding.

Writes docs/artifacts/full_parity_r4_<backend>_nfe<n>[_<precision>_precision].json
and asserts:
  occupancy-mask agreement >= 0.999, token/logit drift within the
  tolerances recorded in the artifact.

Run:  python scripts/full_parity.py     (~10 min, mostly torch CPU)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import torch  # noqa: E402

from tests.reference_loader import load_reference_models  # noqa: E402

import jax  # noqa: E402

if os.environ.get("RALD_PARITY_CPU") == "1":
    # same backend tier as tests/test_reference_parity.py (conftest forces
    # CPU there too); use when the TPU is busy/unavailable
    jax.config.update("jax_platforms", "cpu")

# On TPU, f32 matmuls default to bf16 multiplications; for a strict diff
# against torch-CPU f32 the engines' checkpoint-parity setting applies
# (system.matmul_precision: 'highest' — main_generation.py:115-116).
# Measured here: default precision leaves the 7-NFE tokens at 6e-5 but the
# near-zero random-weight decode logits pick up ~1.3e-3 noise (the logit
# std itself is only 8e-3), flipping ~6% of threshold signs — artifact
# full_parity_r4_tpu_default_precision.json records that run.
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("RALD_PARITY_PRECISION", "highest"),
)

from rald_tpu.parallel.mesh import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from rald_tpu.config import Config  # noqa: E402
from rald_tpu.convert.torch_ckpt import (  # noqa: E402
    convert_edm_state_dict,
    convert_vae_state_dict,
)
from rald_tpu.diffusion.edm import sample_prior_latents  # noqa: E402
from rald_tpu.eval.chamfer import chamfer_distance  # noqa: E402
from rald_tpu.train.gen_engine import GenerationEngine  # noqa: E402

NUM_STEPS = int(os.environ.get("RALD_PARITY_STEPS", "4"))  # 2n-1 NFEs;
# RALD_PARITY_STEPS=18 runs the product chain's exact 35-NFE count
NUM_QUERIES = 50_000
# RALD_PARITY_CENTER_OCC=1: center the occupancy head's bias at the median
# decoded logit (IDENTICALLY on both sides, before conversion) so the
# thresholded clouds are non-empty. Random-init logits at 35 NFEs all sit
# below 0 (std 2.8e-3), so without this the mask comparison is vacuously
# 1.0 on two empty clouds (round-4 VERDICT missing #2); centering puts
# ~half the 50k queries on each side of the threshold — the HARDEST
# version of the mask-agreement test, since every logit is within a few
# std of the decision boundary.
CENTER_OCC = os.environ.get("RALD_PARITY_CENTER_OCC") == "1"


def _ref_cfg():
    return Config(
        cond_type="radar", use_radar_cond=True, use_radar_enc=True,
        unfreeze_radar_enc=True, radar_token_channel=512,
        enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
        enc_radar_ch=16, enc_hidden_ch=64,
    )


def _engine_cfg():
    return Config({
        "system": {"seed": 0, "compute_dtype": "float32"},
        "dataset": {
            "lidar": {"num_samples": 10000},
            "radar": {
                "upsample": False,
                "input_r_dim": 128, "input_a_dim": 64, "input_e_dim": 32,
                "input_ch": 3,
            },
        },
        "train": {"epochs": 1, "warmup_epochs": 0, "blr": 1e-4, "lr": 1e-4,
                  "min_lr": 1e-6, "clip_grad": 0},
        "ar_model": {"name": "kl_d512_m512_l32_d24_edm", "configs": _ref_cfg()},
        "lidar_ae": {"name": "kl_d512_m512_l32_mix", "latent_std": 1},
        "eval": {"inference": {"num_steps": NUM_STEPS}},
    })


def main():
    ref_ae, ref_gen, _ = load_reference_models()
    t0 = time.time()

    print("building torch reference models (full size, seeded random init)...")
    torch.manual_seed(0)
    t_edm = ref_gen.kl_d512_m512_l32_d24_edm(configs=_ref_cfg()).eval()
    t_vae = ref_ae.create_autoencoder(
        dim=512, M=512, latent_dim=32, N=10000, query_type="mix"
    ).eval()

    print("converting state dicts...")
    edm_params = convert_edm_state_dict(
        {k: v for k, v in t_edm.state_dict().items()}, depth=24
    )

    engine = GenerationEngine(_engine_cfg())

    rng = np.random.default_rng(10)
    cube = rng.normal(size=(1, 128, 64, 32, 3)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(1, NUM_QUERIES, 3)).astype(np.float32)
    seeds = jnp.arange(1)

    # identical prior draw on both sides (reference sample() draws via
    # StackedRandomGenerator then calls edm_sampler with it; we inject the
    # same array directly — S_churn=0 makes the rest deterministic)
    lat_np = np.asarray(sample_prior_latents(seeds, 512, 32))

    print(f"our side: {2 * NUM_STEPS - 1}-NFE sample on {jax.default_backend()}...")
    t_ours = time.time()
    j_tokens = engine._sample(edm_params, jnp.asarray(cube), seeds)
    j_tokens_np = np.asarray(j_tokens)  # forced readback (axon: block_until_ready no-op)
    sample_s = time.time() - t_ours

    print(f"reference side: torch CPU sampler (~47 s/NFE)...")
    t_ref = time.time()
    with torch.no_grad():
        t_tokens = ref_gen.edm_sampler(
            t_edm, torch.from_numpy(lat_np.copy()), torch.from_numpy(cube),
            "radar", num_steps=NUM_STEPS,
        ).to(torch.float32)

    occ_bias_shift = 0.0
    if CENTER_OCC:
        # probe median logit on the REFERENCE tokens, shift the torch head's
        # bias by it, and only then convert — both sides share the centered
        # weights, so ~25k of the 50k queries land on each side of 0
        with torch.no_grad():
            probe = t_vae.decode(
                t_tokens, torch.from_numpy(grid[:, :4096])
            ).squeeze(-1).numpy()
            occ_bias_shift = -float(np.median(probe))
            t_vae.to_outputs.bias += occ_bias_shift
        print(f"centered occupancy head: bias shift {occ_bias_shift:+.5f}")

    vae_params = convert_vae_state_dict(
        {k: v for k, v in t_vae.state_dict().items()}, depth=24, query_type="mix"
    )

    t_ours = time.time()
    j_logits = np.asarray(engine._decode(vae_params, j_tokens, jnp.asarray(grid)))
    ours_s = sample_s + (time.time() - t_ours)
    print(f"  our side done in {ours_s:.1f}s")

    with torch.no_grad():
        t_logits = t_vae.decode(t_tokens, torch.from_numpy(grid)).squeeze(-1).numpy()
        # decode once more with OUR tokens -> isolates sampler drift from
        # decoder drift in the logit comparison
        t_logits_jtok = t_vae.decode(
            torch.from_numpy(j_tokens_np), torch.from_numpy(grid)
        ).squeeze(-1).numpy()
    ref_s = time.time() - t_ref
    print(f"  reference side done in {ref_s:.1f}s")

    t_tokens_np = t_tokens.numpy()
    tok_abs = np.abs(j_tokens_np - t_tokens_np)
    tok_rms = float(np.sqrt(np.mean(t_tokens_np ** 2)))
    logit_abs = np.abs(j_logits - t_logits)
    logit_abs_same_tok = np.abs(j_logits - t_logits_jtok)

    agree = float(np.mean((j_logits[0] > 0) == (t_logits[0] > 0)))
    t_pred = grid[0][t_logits[0] > 0]
    j_pred = grid[0][j_logits[0] > 0]
    cd = float(chamfer_distance(j_pred, t_pred)) if len(t_pred) and len(j_pred) else None

    result = {
        "config": {
            "edm": "kl_d512_m512_l32_d24_edm (depth 24, dim 512, 184M params)",
            "vae": "kl_d512_m512_l32_mix (depth 24, dim 512, 106M params)",
            "num_steps": NUM_STEPS, "nfe": 2 * NUM_STEPS - 1,
            "num_queries": NUM_QUERIES,
            "cube_shape": [1, 128, 64, 32, 3],
            "compute_dtype": "float32", "backend": jax.default_backend(),
        },
        "tokens": {
            "max_abs_diff": float(tok_abs.max()),
            "mean_abs_diff": float(tok_abs.mean()),
            "ref_rms": tok_rms,
            "max_rel_to_rms": float(tok_abs.max() / tok_rms),
        },
        "logits": {
            "max_abs_diff": float(logit_abs.max()),
            "mean_abs_diff": float(logit_abs.mean()),
            "max_abs_diff_same_tokens": float(logit_abs_same_tok.max()),
            "ref_logit_std": float(np.std(t_logits)),
        },
        "occupancy": {
            "mask_agreement": agree,
            "ref_positives": int(len(t_pred)),
            "ours_positives": int(len(j_pred)),
            "chamfer": cd,
            "occ_head_centered": CENTER_OCC,
            "occ_bias_shift": occ_bias_shift,
        },
        "wall_s": {"ours": ours_s, "reference_torch_cpu": ref_s,
                   "total": time.time() - t0},
    }
    result["config"]["matmul_precision"] = os.environ.get("RALD_PARITY_PRECISION", "highest")
    precision = result["config"]["matmul_precision"]
    tag = "" if precision == "highest" else f"_{precision}_precision"
    if CENTER_OCC:
        tag += "_centered"
    out = (REPO / "docs" / "artifacts" /
           f"full_parity_r5_{jax.default_backend()}_nfe{2 * NUM_STEPS - 1}{tag}.json")
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))

    if CENTER_OCC:
        assert len(t_pred) >= 10_000 and len(j_pred) >= 10_000, (
            f"centered run still near-empty: ref {len(t_pred)}, ours {len(j_pred)}"
        )
    assert agree >= 0.999, f"occupancy mask agreement {agree} < 0.999"
    assert tok_abs.max() <= 0.05 * max(tok_rms, 1.0), (
        f"token drift {tok_abs.max():.2e} vs rms {tok_rms:.3f}"
    )
    print(f"PASS — artifact written to {out}")


if __name__ == "__main__":
    main()
