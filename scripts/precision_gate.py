"""Close the precision question WITH TRAINED WEIGHTS (round-4 VERDICT #4).

Round 4 measured, on RANDOM weights (logit std 8e-3), that the TPU's
default matmul precision (f32 matmuls as bf16 multiplies) flips ~6% of
near-zero occupancy thresholds vs `matmul_precision: 'highest'`
(docs/artifacts/full_parity_r4_tpu_default_precision.json). Every published
quality number runs at default precision with TRAINED weights, where logits
are O(1) and flips were *assumed* to vanish. This script measures instead
of assuming, on the converged checkpoint:

  1. mask agreement: the fused sample+decode (35-NFE EDM + 1.2M-query
     occupancy threshold) on the same eval batches at default vs highest
     precision — fraction of grid hits that agree, per batch;
  2. metric deltas: the FULL product eval recipe (grid 500k + helper 7e5 +
     refine 5e5 + Chamfer/F-score) at both precisions — delta IoU / CD / F.

Usage:
  python scripts/precision_gate.py [CURVES_ROOT] [CKPT] [MASK_BATCHES]

Writes docs/artifacts/precision_gate_<ckpt-name>.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from rald_tpu.config import Config  # noqa: E402


def _recipe_cfg(root, ckpt) -> Config:
    cfg = Config(yaml.safe_load((root / "gen.yml").read_text()))
    cfg.system.mode = "eval"
    cfg.eval.ckpt = str(ckpt)
    # the reference's full inference recipe (same as product_eval_bench.py)
    cfg.dataset.use_query_helper = True
    cfg.dataset.query_helper_aug = True
    cfg.dataset.query_aug_num = 7e5
    cfg.dataset.query_aug_scale = 2
    cfg.eval.inference = Config({
        "num_query_points": 500000,
        "query_helper": True,
        "refine_query": True,
        "refine_query_aug_num": 500000,
        "refine_query_scale": 10,
    })
    cfg.eval.use_test_set = True
    cfg.eval.store_pc = False
    cfg.eval.freq = 1
    return cfg


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/curves")
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else root / "out_gen" / "checkpoint-479"
    mask_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    assert ckpt.exists(), f"no checkpoint at {ckpt}"

    import jax  # noqa: E402

    if os.environ.get("RALD_BENCH_CPU") == "1":  # harness smoke tests
        jax.config.update("jax_platforms", "cpu")

    from rald_tpu.cli.main_generation import build_loaders, load_frozen_modules  # noqa: E402
    from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed  # noqa: E402
    from rald_tpu.train.checkpoint import CheckpointManager  # noqa: E402
    from rald_tpu.train.gen_engine import GenerationEngine  # noqa: E402

    enable_compilation_cache()
    info = init_distributed()
    out = {"ckpt": str(ckpt), "backend": jax.default_backend(),
           "inference_mode": "bf16 (product default)", "precisions": {}}

    # shared state across the two precision runs
    cfg = _recipe_cfg(root, ckpt)
    _, eval_loader, _ = build_loaders(cfg, info, "eval")
    use_ema = bool(cfg.train.get("use_ema", True))

    hits_by_precision = {}
    for precision in ("default", "highest"):
        jax.config.update("jax_default_matmul_precision",
                          None if precision == "default" else precision)
        engine = GenerationEngine(cfg)
        state = engine.init_state(1, int(cfg.dataset.batch_size))
        state, _ = CheckpointManager(ckpt.parent).restore(state, ckpt)
        vae_params, radar_enc_params = load_frozen_modules(cfg, engine)
        params = state.ema_params if use_ema else state.params

        # --- phase 1: grid-hit masks on the same batches (same host grid /
        # helper / seeds both times: the loader and grid RNG are re-seeded)
        rng_np = np.random.default_rng(0)
        from rald_tpu.eval.queries import build_query_grid

        masks = []
        it = iter(eval_loader)
        for b in range(mask_batches):
            batch = next(it)
            radar_cube = jax.device_put(batch["radar_cube"])
            if engine.frozen_radar_enc:
                radar_cube = engine._radar_encode(radar_enc_params, radar_cube)
            grid = build_query_grid(
                cfg.dataset.lidar, int(cfg.eval.inference.num_query_points),
                False, rng_np,
            )
            bsz = np.asarray(batch["lidar_points"]).shape[0]
            helper = np.asarray(batch["helper_points"], np.float32)
            _, _, hits = engine._sample_and_decode(
                params, vae_params, radar_cube, np.arange(b * bsz, (b + 1) * bsz),
                jax.device_put(batch["query_points"]), jax.device_put(grid),
                jax.device_put(helper),
            )
            masks.append(np.asarray(hits))
        hits_by_precision[precision] = np.concatenate(masks)

        # --- phase 2: the full product recipe end to end
        t0 = time.perf_counter()
        stats = engine.evaluate(
            state, eval_loader, vae_params, radar_enc_params, use_ema=use_ema,
        )
        out["precisions"][precision] = {
            "iou": round(float(stats.get("iou", -1)), 5),
            "cd_m": round(float(stats.get("cd", -1)), 5),
            "fscore": round(float(stats.get("fscore", -1)), 5),
            "eval_wall_s": round(time.perf_counter() - t0, 1),
        }
        print(precision, out["precisions"][precision], flush=True)

    a, b = hits_by_precision["default"], hits_by_precision["highest"]
    pos = np.logical_or(a, b).sum()
    out["mask"] = {
        "batches": mask_batches,
        "queries_compared": int(a.size),
        "agreement": round(float(np.mean(a == b)), 6),
        "positive_iou": round(float(np.logical_and(a, b).sum() / max(pos, 1)), 6),
        "positives_default": int(a.sum()),
        "positives_highest": int(b.sum()),
    }
    d, h = out["precisions"]["default"], out["precisions"]["highest"]
    out["deltas_default_minus_highest"] = {
        "iou": round(d["iou"] - h["iou"], 5),
        "cd_m": round(d["cd_m"] - h["cd_m"], 5),
        "fscore": round(d["fscore"] - h["fscore"], 5),
    }
    path = REPO / "docs" / "artifacts" / f"precision_gate_{ckpt.name}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))
    print("written:", path)


if __name__ == "__main__":
    main()
