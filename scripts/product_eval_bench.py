"""Measure the PRODUCT eval path's throughput with the reference's full
inference recipe (VERDICT r3 "Next round" #2b).

``bench.py`` measures a purpose-built chain (fixed 500k grid, no CFAR
helper points, no refine pass). The reference's shipped eval config
(`configs/generation/..._eval.yml`) runs CFAR-helper query augmentation to
7e5 + a 5e5-point refine pass (engine_generation.py:250-310). This script
drives OUR product path — ``GenerationEngine.evaluate`` exactly as
``main_generation`` eval mode invokes it — on the synthetic test split
with that full recipe and reports sustained pc/s:

  grid 500k + helper aug to 7e5  ->  fused sample+decode (35-NFE EDM)
  -> threshold -> batched refine decode (5e5 jittered queries, scale 10)
  -> polar->cartesian -> Chamfer + F-score.

Two timed passes over the loader; the second (all programs compiled, OS
page cache warm) is the published number. Host-side work (voxel/query
pipeline, helper augmentation, metrics) is INCLUDED — that is the point:
this is what `main_generation --config ..._eval.yml` actually sustains.

Usage:
  python scripts/product_eval_bench.py [CURVES_ROOT] [CKPT]
    CURVES_ROOT: dataset+checkpoint tree from scripts/rerun_to_convergence.sh
                 (default /tmp/curves)
    CKPT:        stage-2 checkpoint dir (default <root>/out_gen/checkpoint-479)

Env knobs:
  RALD_PE_PROFILE=1   attribute the timed pass to pipeline stages with
                      StageTimer (serializes host/device overlap — the
                      attribution run, not the published number) and write
                      docs/artifacts/product_eval_attrib.json instead.
  RALD_PE_BATCHES=N   cap each pass at N loader batches (quick attribution
                      runs; the published number uses the full split).
  RALD_BENCH_INT8     '', '1'/'dynamic', or 'static' — forwarded to
                      eval.inference.int8_ff like bench.py.

Writes docs/artifacts/product_eval_bench.json (or _attrib.json).
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


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/curves")
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else root / "out_gen" / "checkpoint-479"
    assert ckpt.exists(), f"no checkpoint at {ckpt} — run scripts/rerun_to_convergence.sh first"

    cfg = Config(yaml.safe_load((root / "gen.yml").read_text()))
    cfg.system.mode = "eval"
    cfg.eval.ckpt = str(ckpt)
    # the reference's full inference recipe
    # (ge_indoor_unfreeze_enc_ints_only_eval.yml eval.inference)
    cfg.dataset.use_query_helper = True
    cfg.dataset.query_helper_aug = True
    cfg.dataset.query_aug_num = 7e5
    cfg.dataset.query_aug_scale = 2
    # ship RAW CFAR points; densify to 7e5 inside the fused eval program
    # (the host-densified set was a 67 MB/batch upload — the largest row of
    # the round-5 stage attribution). RALD_PE_HOST_HELPER=1 restores the
    # host-aug path for A/B measurement.
    cfg.dataset.helper_aug_on_device = os.environ.get("RALD_PE_HOST_HELPER") != "1"
    cfg.eval.inference = Config({
        "num_query_points": 500000,
        "query_helper": True,
        "query_helper_aug": True,
        "query_aug_num": 7e5,
        "refine_query": True,
        "refine_query_aug_num": 500000,
        "refine_query_scale": 10,
    })
    int8_env = os.environ.get("RALD_BENCH_INT8", "")
    if int8_env in ("1", "dynamic"):
        cfg.eval.inference.int8_ff = True
        cfg.eval.inference.int8_attn = "vout"
    elif int8_env == "static":
        cfg.eval.inference.int8_ff = "static"
        cfg.eval.inference.int8_attn = "vout"
    elif int8_env:
        raise SystemExit(f"RALD_BENCH_INT8 must be ''/'1'/'dynamic'/'static', got {int8_env!r}")
    cfg.eval.use_test_set = True
    cfg.eval.store_pc = False
    cfg.eval.freq = 1

    profile = os.environ.get("RALD_PE_PROFILE") == "1"
    max_batches = int(os.environ.get("RALD_PE_BATCHES", "0") or 0)

    import jax  # noqa: E402  (after config so env hooks apply)

    if os.environ.get("RALD_BENCH_CPU") == "1":  # harness smoke tests
        jax.config.update("jax_platforms", "cpu")

    from rald_tpu.cli.main_generation import build_loaders, load_frozen_modules  # noqa: E402
    from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed, make_mesh  # noqa: E402
    from rald_tpu.train.checkpoint import CheckpointManager  # noqa: E402
    from rald_tpu.train.gen_engine import GenerationEngine  # noqa: E402

    enable_compilation_cache()
    info = init_distributed()
    mesh = make_mesh()
    _, eval_loader, _ = build_loaders(cfg, info, "eval")
    engine = GenerationEngine(cfg, mesh)
    state = engine.init_state(1, int(cfg.dataset.batch_size))
    state, _ = CheckpointManager(ckpt.parent).restore(state, ckpt)
    vae_params, radar_enc_params = load_frozen_modules(cfg, engine)

    # REAL frame count: pad_last duplicates frames to fill the final batch,
    # so len(loader) * batch_size would overstate throughput
    frames = sum(1 for _ in iter(eval_loader.sampler))
    use_ema = bool(cfg.train.get("use_ema", True))

    loader = eval_loader
    if max_batches:

        class _Capped:
            def __iter__(self):
                import itertools

                return itertools.islice(iter(eval_loader), max_batches)

        loader = _Capped()
        frames = min(frames, max_batches * int(cfg.dataset.get("eval_batch_size", 1)))

    from rald_tpu.train.profiler import StageTimer  # noqa: E402

    results = {}
    stage_report = None
    for pass_name in ("warmup", "timed"):
        timer = StageTimer(enabled=profile and pass_name == "timed")
        t0 = time.perf_counter()
        stats = engine.evaluate(
            state, loader, vae_params, radar_enc_params, use_ema=use_ema,
            stage_timer=timer,
        )
        wall = time.perf_counter() - t0
        results[pass_name] = {
            "wall_s": round(wall, 2),
            "frames": frames,
            "pc_per_sec": round(frames / wall, 3),
            "iou": round(float(stats.get("iou", -1)), 4),
            "cd_m": round(float(stats.get("cd", -1)), 4),
            "fscore": round(float(stats.get("fscore", -1)), 4),
        }
        print(f"[{pass_name}] {results[pass_name]}", flush=True)
        if timer.enabled:
            stage_report = {k: round(v, 3) for k, v in timer.report().items()}
            covered = sum(timer.seconds.values())
            stage_report["_stages_total_s"] = round(covered, 3)
            stage_report["_wall_s"] = round(wall, 3)
            stage_report["_unattributed_s"] = round(wall - covered, 3)
            print("stage attribution (s):", json.dumps(stage_report, indent=2), flush=True)

    out = {
        "recipe": "reference full eval: grid 500k + CFAR helper aug 7e5 + refine 5e5 scale 10",
        "eval_batch_size": int(cfg.dataset.get("eval_batch_size", 1)),
        "ckpt": str(ckpt),
        "backend": jax.default_backend(),
        "inference_mode": {"": "bf16", "1": "int8_dynamic+vout", "dynamic": "int8_dynamic+vout",
                           "static": "int8_static+vout"}[int8_env],
        "matmul_precision": str(jax.config.jax_default_matmul_precision or "default"),
        "passes": results,
        "note": "timed pass = all XLA programs cached; includes host pipeline, "
                "helper/refine augmentation and Chamfer/F-score metrics",
    }
    out["compiled_programs"] = engine.compiled_program_counts()
    if stage_report is not None:
        out["stage_attribution_s"] = stage_report
        out["note"] += "; PROFILED run (stage attribution serializes overlap)"
    name = "product_eval_attrib.json" if profile or max_batches else "product_eval_bench.json"
    if int8_env and not (profile or max_batches):
        # keep the bf16 (product-default) artifact; int8 runs get their own
        name = f"product_eval_bench_int8_{'static' if int8_env == 'static' else 'dynamic'}.json"
    path = REPO / "docs" / "artifacts" / name
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["passes"]["timed"]), flush=True)
    print("written:", path)


if __name__ == "__main__":
    main()
