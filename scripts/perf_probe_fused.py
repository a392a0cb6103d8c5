"""Stage-level device timing of the fused product-eval program.

The round-5 fuse collapsed the whole eval step (reference
engine_generation.py:138-310 semantics) into ONE XLA program, so the wall
attribution (docs/artifacts/product_eval_attrib.json) now shows a single
93% "device exec" row. This probe re-times the program's internal stages
as SEPARATE jitted programs at the exact product shapes (batch 8, grid
500k + helper 7e5, refine 5e5 scale 10, 35-NFE sampler) so the next
optimization target inside the fused program is chosen from measurement,
not guesswork. The per-stage sum exceeds the fused wall by the fusion
gains (intermediate HBM round-trips the one-program version avoids);
shares are what matter.

Usage:
  python scripts/perf_probe_fused.py [CURVES_ROOT] [CKPT] [REPS]

Writes docs/artifacts/fused_stage_probe.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from rald_tpu.config import Config  # noqa: E402


def _recipe_cfg(root: Path, ckpt: Path) -> Config:
    cfg = Config(yaml.safe_load((root / "gen.yml").read_text()))
    cfg.system.mode = "eval"
    cfg.eval.ckpt = str(ckpt)
    cfg.dataset.use_query_helper = True
    cfg.dataset.query_helper_aug = True
    cfg.dataset.query_aug_num = 7e5
    cfg.dataset.query_aug_scale = 2
    cfg.dataset.helper_aug_on_device = True
    cfg.eval.inference = Config({
        "num_query_points": 500000,
        "query_helper": True,
        "query_helper_aug": True,
        "query_aug_num": 7e5,
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    assert ckpt.exists(), f"no checkpoint at {ckpt}"
    cfg = _recipe_cfg(root, ckpt)

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from rald_tpu.cli.main_generation import build_loaders, load_frozen_modules  # noqa: E402
    from rald_tpu.eval.chamfer import batched_cd_fscore_graph  # noqa: E402
    from rald_tpu.eval.densify import densify_queries  # noqa: E402
    from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed  # noqa: E402
    from rald_tpu.train.checkpoint import CheckpointManager  # noqa: E402
    from rald_tpu.train.gen_engine import GenerationEngine  # noqa: E402
    import rald_tpu.geometry as geo  # noqa: E402

    enable_compilation_cache()
    info = init_distributed()
    _, eval_loader, _ = build_loaders(cfg, info, "eval")
    engine = GenerationEngine(cfg)
    state = engine.init_state(1, int(cfg.dataset.batch_size))
    state, _ = CheckpointManager(ckpt.parent).restore(state, ckpt)
    vae_params, radar_enc_params = load_frozen_modules(cfg, engine)
    params = state.ema_params if bool(cfg.train.get("use_ema", True)) else state.params

    batch = next(iter(eval_loader))
    bsz = int(np.asarray(batch["lidar_points"]).shape[0])
    lidar = cfg.dataset.lidar
    aniso, iso = bool(lidar.norm_anisotropy), bool(lidar.norm_isotropy)

    radar_cube = jax.device_put(batch["radar_cube"])
    if engine.frozen_radar_enc:
        radar_cube = engine._radar_encode(radar_enc_params, radar_cube)
    seeds = jnp.arange(bsz)
    q_eval = jax.device_put(batch["query_points"])
    labels = jax.device_put(np.asarray(batch["query_labels"], np.float32))
    helper = jax.device_put(np.asarray(batch["helper_points"], np.float32))
    helper_mask = jax.device_put(np.asarray(batch["helper_mask"], bool))
    surface = np.asarray(batch["lidar_points"])
    pts_num = np.asarray(batch.get("points_num", [surface.shape[1]] * bsz), np.int64)
    smask = jax.device_put(np.arange(surface.shape[1])[None] < pts_num[:, None])
    surface_d = jax.device_put(surface.astype(np.float32))
    key = jax.random.PRNGKey(17)

    def _sync(out):
        # On the tunneled axon backend `jax.block_until_ready` returns
        # immediately (execution only provably completes at D2H readback —
        # the same reason perf_probe_attrib's stage is called
        # "metrics_readback"). Force a real sync by reading ONE element of
        # the first output leaf: every timed fn is a single XLA program, so
        # no output is readable before the whole program has executed; the
        # 0-d slice keeps the D2H payload at 4 bytes (one dispatch + RTT of
        # overhead — the sync_overhead_floor row below measures it).
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
        return out

    def timed(name, fn, *args, **kwargs):
        out = _sync(fn(*args, **kwargs))  # compile + warm
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn(*args, **kwargs))
            best.append(time.perf_counter() - t0)
        ms = min(best) * 1000
        print(f"{name:28s} {ms:9.1f} ms", flush=True)
        results[name] = round(ms, 1)
        return out

    results: dict = {}

    # --- sync-overhead floor: dispatch + 4-byte readback of a trivial op.
    # Every stage row below includes roughly this much tunnel overhead per
    # output leaf; rows near this floor are "free" stages, not zero-cost.
    _tiny = jax.device_put(np.zeros((8, 128), np.float32))
    timed("sync_overhead_floor", jax.jit(lambda x: x + 1.0), _tiny)

    # --- the whole fused program (the published path) ---
    timed(
        "fused_eval_step", engine._fused_eval,
        params, vae_params, radar_cube, seeds, q_eval, labels, labels,
        None, key, helper, helper_mask, surface_d, smask,
        has_mask=False, compute_cd=True, refine=True,
        helper_aug=True, use_device_grid=True,
    )

    # --- stage programs at the same shapes ---
    tokens = timed("sampler_35nfe", engine._sample, params, radar_cube, seeds)

    inference = cfg.eval.inference
    num_query = int(inference.num_query_points)
    k_grid, k_helper, k_refine = jax.random.split(key, 3)
    offset, scale = geo.norm_scale_offset(np.asarray(lidar.pc_range, np.float32))
    lo, hi = -np.ones(3, np.float32), np.ones(3, np.float32)
    if iso:
        lo, hi = -(scale / scale.max()), scale / scale.max()
    grid = jax.random.uniform(k_grid, (num_query, 3), minval=lo, maxval=hi)

    dens_helper = jax.jit(lambda h, m, k: densify_queries(
        h, m, int(float(cfg.dataset.query_aug_num)), k,
        lidar.pc_range, lidar.voxel_size,
        int(cfg.dataset.query_aug_scale), aniso, iso))
    helper_dense, _, _ = timed("densify_helper_7e5", dens_helper, helper, helper_mask, k_helper)

    q_grid = jnp.concatenate(
        [jnp.broadcast_to(grid[None], (bsz,) + grid.shape), helper_dense], axis=1
    )
    timed("decode_eval_queries", engine._decode, vae_params, tokens, q_eval)
    hits = timed(
        "decode_grid_1p2M", jax.jit(lambda v, t, q: engine._decode_impl(v, t, q) > 0),
        vae_params, tokens, q_grid,
    )

    refine_n = int(float(inference.refine_query_aug_num))
    dens_refine = jax.jit(lambda q, h, k: densify_queries(
        q, h, refine_n, k, lidar.pc_range, lidar.voxel_size,
        int(inference.refine_query_scale), aniso, iso))
    refined, valid, _ = timed("densify_refine_5e5", dens_refine, q_grid, hits, k_refine)

    hits2 = timed(
        "decode_refine_5e5", jax.jit(lambda v, t, q: engine._decode_impl(v, t, q) > 0),
        vae_params, tokens, refined,
    )
    pred_mask = jnp.logical_and(hits2, valid)

    def _metric_tail(pred_pts, pred_mask, gt, gt_mask):
        pred_un = geo.inverse_norm_points(pred_pts, lidar.pc_range, aniso, iso)
        gt_un = geo.inverse_norm_points(gt, lidar.pc_range, aniso, iso)
        if lidar.get("view_cone_mode", False):
            pred_un = geo.polar2cartesian(pred_un)
            gt_un = geo.polar2cartesian(gt_un)
        return batched_cd_fscore_graph(
            pred_un, pred_mask, gt_un, gt_mask,
            jnp.float32(engine.fscore_tau), use_pallas=engine._chamfer_pallas,
        )
    timed("chamfer_fscore_tail", jax.jit(_metric_tail),
          refined, pred_mask, surface_d, smask)

    # the NN kernel alone, both directions, at metric scale
    from rald_tpu.ops.nn_dist_kernel import nn_min_sq_batch, nn_min_sq_both
    pred_un = geo.inverse_norm_points(refined, lidar.pc_range, aniso, iso)
    gt_un = geo.inverse_norm_points(surface_d.astype(jnp.float32), lidar.pc_range, aniso, iso)
    if lidar.get("view_cone_mode", False):
        pred_un, gt_un = geo.polar2cartesian(pred_un), geo.polar2cartesian(gt_un)
    pred_un, gt_un = jax.block_until_ready((pred_un, gt_un))
    timed("nn_pred_to_gt", nn_min_sq_batch, pred_un, gt_un)
    timed("nn_gt_to_pred", nn_min_sq_batch, gt_un, pred_un)
    timed("nn_both_fused", nn_min_sq_both, pred_un, gt_un)

    timed("eval_metrics", engine._eval_metrics,
          engine._decode(vae_params, tokens, q_eval), labels, labels, has_mask=False)

    stage_keys = [k for k in results if k != "fused_eval_step"]
    out = {
        "recipe": "product eval shapes: batch %d, grid 500k + helper 7e5, refine 5e5" % bsz,
        "ckpt": str(ckpt),
        "backend": jax.default_backend(),
        "matmul_precision": "default",
        "reps": reps,
        "ms": results,
        "stage_sum_ms": round(sum(results[k] for k in stage_keys), 1),
        "note": "stages re-run as separate programs; their sum exceeds the "
                "fused wall by the fusion gains (intermediate HBM traffic)",
    }
    path = REPO / "docs" / "artifacts" / "fused_stage_probe.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print("written:", path)


if __name__ == "__main__":
    main()
