"""Offline inference driver: radar cube files -> dense point clouds (PLY).

A serving-style surface the reference lacks as a standalone tool: its only
inference path rides the eval loop (reference engine_generation.py:138-355),
which requires a fully preprocessed dataset (GT LiDAR, query labels, split
files). This CLI needs nothing but radar cubes on disk — it loads the
trained stage-2 + stage-1 checkpoints from the same YAML that
``main_generation``'s eval mode uses, jits the sampling chain once, streams
cubes through it in fixed-size batches (pad-last, so there is exactly one
compiled program), thresholds the occupancy grid, and writes one ``.ply``
per input file.

    python -m rald_tpu.cli.infer --config configs/generation/..._eval.yml \\
        --input '/data/**/radar_cube/*.npy' --out ./pred --batch 8

Input files: ``.npy`` radar cubes shaped like the dataset's ``radar_cube``
field ``(r, a, e, c)``, or ``.npz`` archives holding one under the
``radar_cube`` key. All of the eval config's inference knobs apply
(``num_query_points``, ``cast_params_bf16``, ``int8_ff``/``int8_attn``,
``use_cart_query``, ``shard_queries``); raw cubes upsample in-graph when
``dataset.radar.upsample(+_on_device)`` is set. Frozen-radar-encoder
configs run the frozen encoder exactly as eval does.
"""
from __future__ import annotations

import argparse
import glob
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu import geometry as geo
from rald_tpu.config import Config, load_config
from rald_tpu.eval.queries import generate_query_points, generate_query_points_cart
from rald_tpu.eval.ply import write_ply
from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed, make_mesh
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.gen_engine import GenerationEngine


def collect_inputs(pattern: str) -> list[Path]:
    p = Path(pattern)
    if p.is_dir():
        files = sorted(list(p.rglob("*.npy")) + list(p.rglob("*.npz")))
    else:
        files = sorted(Path(f) for f in glob.glob(pattern, recursive=True))
    if not files:
        raise FileNotFoundError(f"no .npy/.npz radar cubes match {pattern!r}")
    return files


def load_cube(path: Path) -> np.ndarray:
    if path.suffix == ".npz":
        with np.load(path) as z:
            return np.asarray(z["radar_cube"], np.float32)
    return np.asarray(np.load(path), np.float32)


def run(cfg: Config, inputs: str, out_dir: str, batch: int = 0,
        threshold: float = 0.0, print_fn=print) -> dict:
    enable_compilation_cache()
    if cfg.system.get("matmul_precision"):
        jax.config.update("jax_default_matmul_precision", cfg.system.matmul_precision)
    info = init_distributed()
    mesh = make_mesh()

    engine = GenerationEngine(cfg, mesh)
    state = engine.init_state(steps_per_epoch=1, world_batch=1)

    ckpt_dir = cfg.get("eval", {}).get("ckpt")
    if ckpt_dir and Path(str(ckpt_dir)).exists():
        state, _ = CheckpointManager(Path(str(ckpt_dir)).parent).restore(state, ckpt_dir)
        print_fn(f"Loaded generation checkpoint from {ckpt_dir}")
    else:
        print_fn("WARNING: eval.ckpt missing — sampling with random weights")

    from rald_tpu.cli.main_generation import load_frozen_modules

    vae_params, radar_enc_params = load_frozen_modules(cfg, engine)

    use_ema = bool(cfg.train.get("use_ema", True))
    params = state.ema_params if use_ema else state.params
    print_fn(f"Using {'EMA' if use_ema else 'model'} parameters for inference")

    ev = cfg.get("eval", {})
    if bool(ev.get("cast_params_bf16", False)):
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
        )
        params, vae_params = cast(params), cast(vae_params)
        if radar_enc_params is not None:
            radar_enc_params = cast(radar_enc_params)

    inference = ev.get("inference", {})
    num_query = int(inference.get("num_query_points", 500000))
    lidar = cfg.dataset.lidar
    aniso, iso = lidar.norm_anisotropy, lidar.norm_isotropy
    rng_np = np.random.default_rng(int(cfg.system.get("seed", 0)))
    if bool(ev.get("use_cart_query", False)):
        grid = generate_query_points_cart(
            num_query, lidar.pc_range_cart, lidar.pc_range, aniso, iso, rng_np
        )
    else:
        grid = generate_query_points(num_query, lidar.pc_range, aniso, iso, rng_np)
    grid = np.asarray(grid, np.float32)

    files = collect_inputs(inputs)
    if info["world_size"] > 1:
        # multi-host: each process takes an interleaved slice of the file
        # list (same pattern as ShardedSampler without shuffling) and writes
        # its own outputs — no cross-host coordination needed
        files = files[info["rank"]::info["world_size"]]
        print_fn(f"rank {info['rank']}/{info['world_size']}: {len(files)} files")
    bsz = batch or int(cfg.dataset.get("eval_batch_size", 1))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    n_points = []
    t0 = time.perf_counter()
    for start in range(0, len(files), bsz):
        chunk = files[start:start + bsz]
        cubes = np.stack([load_cube(f) for f in chunk])
        if len(chunk) < bsz:  # pad-last: keep the one compiled program
            pad = bsz - len(chunk)
            cubes = np.concatenate([cubes, np.repeat(cubes[-1:], pad, axis=0)])
        cube_dev = jax.device_put(cubes)
        if engine.frozen_radar_enc:
            cube_dev = engine.encode_radar(radar_enc_params, cube_dev)
        # seed by GLOBAL file index (rank + world*local) so a frame's prior
        # noise doesn't depend on how many hosts share the job
        seeds = jnp.arange(start, start + bsz) * info["world_size"] + info["rank"]
        tokens = engine.sample_tokens(params, cube_dev, seeds)
        grid_np = np.broadcast_to(grid, (bsz, num_query, 3)).copy()
        if engine.shard_queries:
            pad_q = (-num_query) % engine.mesh.devices.size
            if pad_q:  # duplicate-pad for even shards; trimmed below
                grid_np = np.concatenate([grid_np, grid_np[:, :pad_q]], axis=1)
        logits = np.asarray(engine.decode_queries(
            vae_params, tokens, jax.device_put(grid_np)))[:, :num_query]
        for i, f in enumerate(chunk):
            pred = geo.inverse_norm_points(grid[logits[i] > threshold],
                                           lidar.pc_range, aniso, iso)
            if lidar.get("view_cone_mode", False):
                pred = geo.polar2cartesian(pred) if len(pred) else pred.reshape(0, 3)
            write_ply(out / (f.stem + ".ply"), pred)
            n_points.append(len(pred))
    dt = time.perf_counter() - t0

    stats = {
        "files": len(files),
        "mean_points": float(np.mean(n_points)) if n_points else 0.0,
        "seconds": dt,
        "frames_per_sec": len(files) / dt if dt > 0 else 0.0,
    }
    print_fn(
        f"* {stats['files']} point clouds -> {out} "
        f"({stats['mean_points']:.0f} pts/frame mean, "
        f"{stats['frames_per_sec']:.2f} frames/s incl. IO)"
    )
    return stats


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True,
                        help="directory or glob of .npy/.npz radar cubes")
    parser.add_argument("--out", required=True, help="output directory for .ply files")
    parser.add_argument("--batch", type=int, default=0,
                        help="batch size (default: dataset.eval_batch_size)")
    parser.add_argument("--threshold", type=float, default=0.0,
                        help="occupancy logit threshold (reference uses 0)")
    args = parser.parse_args()
    cfg = load_config(args.config)
    run(cfg, args.input, args.out, batch=args.batch, threshold=args.threshold)


if __name__ == "__main__":
    main()
