"""Offline inference driver: radar cube files -> dense point clouds (PLY).

A serving-style surface the reference lacks as a standalone tool: its only
inference path rides the eval loop (reference engine_generation.py:138-355),
which requires a fully preprocessed dataset (GT LiDAR, query labels, split
files). This CLI needs nothing but radar cubes on disk — it loads the
trained stage-2 + stage-1 checkpoints from the same YAML that
``main_generation``'s eval mode uses, jits the sampling chain once, streams
cubes through it in fixed-size batches (pad-last, so there is exactly one
compiled program), thresholds the occupancy grid, and writes one ``.ply``
per input file (mirroring the inputs' directory structure, so same-named
frames from different sequences don't collide).

    python -m rald_tpu.cli.infer --config configs/generation/..._eval.yml \\
        --input '/data/**/radar_cube/*.npy' --out ./pred --batch 8

Input files: ``.npy`` radar cubes shaped like the dataset's raw cubes
``(r, a, e, c)``, or ``.npz`` archives holding one under the ``radar_cube``
key. By default each cube gets the SAME host preprocessing the dataset
applies before its engine (intensity/doppler clip+normalize, optional host
upsample — ``data/radar_proc.py``, per the config's ``dataset.radar``
block); pass ``--preprocessed`` for cubes that were already processed
(e.g. dumped from the dataset pipeline). All of the eval config's inference
knobs apply (``num_query_points``, ``cast_params_bf16``,
``int8_ff``/``int8_attn``, ``use_cart_query``, ``shard_queries``); raw
cubes upsample in-graph when ``dataset.radar.upsample(+_on_device)`` is
set. Frozen-radar-encoder configs run the frozen encoder exactly as eval
does.
"""
from __future__ import annotations

import argparse
import glob
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu import geometry as geo
from rald_tpu.config import Config, load_config
from rald_tpu.data.radar_proc import process_radar_cube
from rald_tpu.eval.ply import write_ply
from rald_tpu.eval.queries import build_query_grid
from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed, make_mesh
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.gen_engine import GenerationEngine
from rald_tpu.train.state import cast_tree_bf16


def collect_inputs(pattern: str) -> list[Path]:
    p = Path(pattern)
    if p.is_dir():
        files = sorted(list(p.rglob("*.npy")) + list(p.rglob("*.npz")))
    else:
        files = sorted(Path(f) for f in glob.glob(pattern, recursive=True))
    if not files:
        raise FileNotFoundError(f"no .npy/.npz radar cubes match {pattern!r}")
    return files


def output_paths(files: list[Path], out: Path) -> list[Path]:
    """One .ply per input, mirroring the inputs' structure below their
    common directory — same-named frames from different sequences (the
    dataset's per-sequence 0000.npy naming) must not overwrite each other."""
    base = Path(os.path.commonpath([str(f.parent) for f in files]))
    return [(out / f.parent.relative_to(base) / f.name).with_suffix(".ply") for f in files]


def load_cube(path: Path) -> np.ndarray:
    if path.suffix == ".npz":
        with np.load(path) as z:
            return np.asarray(z["radar_cube"], np.float32)
    return np.asarray(np.load(path), np.float32)


def run(cfg: Config, inputs: str, out_dir: str, batch: int = 0,
        threshold: float = 0.0, preprocessed: bool = False, print_fn=print) -> dict:
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

    # same default as main_generation's eval mode, so the same YAML selects
    # the same weights in both tools
    use_ema = bool(cfg.train.get("use_ema", False))
    params = state.ema_params if use_ema else state.params
    print_fn(f"Using {'EMA' if use_ema else 'model'} parameters for inference")

    ev = cfg.get("eval", {})
    if bool(ev.get("cast_params_bf16", False)):
        params, vae_params = cast_tree_bf16(params), cast_tree_bf16(vae_params)
        if radar_enc_params is not None:
            radar_enc_params = cast_tree_bf16(radar_enc_params)

    inference = ev.get("inference", {})
    num_query = int(inference.get("num_query_points", 500000))
    lidar = cfg.dataset.lidar
    aniso, iso = lidar.norm_anisotropy, lidar.norm_isotropy
    rng_np = np.random.default_rng(int(cfg.system.get("seed", 0)))
    grid = np.asarray(
        build_query_grid(lidar, num_query, bool(ev.get("use_cart_query", False)), rng_np),
        np.float32,
    )

    files = collect_inputs(inputs)
    outs = output_paths(files, Path(out_dir))
    if info["world_size"] > 1:
        # multi-host: each process takes an interleaved slice of the file
        # list (same pattern as ShardedSampler without shuffling) and writes
        # its own outputs — no cross-host coordination needed
        files = files[info["rank"]::info["world_size"]]
        outs = outs[info["rank"]::info["world_size"]]
        print_fn(f"rank {info['rank']}/{info['world_size']}: {len(files)} files")
    bsz = batch or int(cfg.dataset.get("eval_batch_size", 1))

    r = cfg.dataset.get("radar", {})

    def prep(cube: np.ndarray) -> np.ndarray:
        if preprocessed:
            return cube
        # the exact host transform the dataset applies before its engine
        # (data/coloradar.py load_radar block)
        return process_radar_cube(
            cube,
            norm_intensity=r.norm_intensity,
            max_intensity=r.max_intensity,
            norm_dopp=r.norm_dopp,
            max_dopp=r.max_dopp,
            upsample=r.get("upsample", False) and not r.get("upsample_on_device", False),
            tgt_a=r.get("tgt_a_dim"),
            tgt_e=r.get("tgt_e_dim"),
        )

    # loop-invariant: the (padded) query grid ships to the device ONCE
    grid_b = np.broadcast_to(grid, (bsz, num_query, 3))
    if engine.shard_queries:
        pad_q = (-num_query) % engine.mesh.devices.size
        if pad_q:  # duplicate-pad for even shards; trimmed below
            grid_b = np.concatenate([grid_b, grid_b[:, :pad_q]], axis=1)
    grid_dev = jax.device_put(np.ascontiguousarray(grid_b))

    n_points = []
    t0 = time.perf_counter()
    for start in range(0, len(files), bsz):
        chunk = files[start:start + bsz]
        cubes = np.stack([prep(load_cube(f)) for f in chunk])
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
        logits = np.asarray(
            engine.decode_queries(vae_params, tokens, grid_dev))[:, :num_query]
        for i, (f, out_path) in enumerate(zip(chunk, outs[start:start + bsz])):
            pred = geo.inverse_norm_points(grid[logits[i] > threshold],
                                           lidar.pc_range, aniso, iso)
            if lidar.get("view_cone_mode", False):
                pred = geo.polar2cartesian(pred) if len(pred) else pred.reshape(0, 3)
            write_ply(out_path, pred)
            n_points.append(len(pred))
    dt = time.perf_counter() - t0

    stats = {
        "files": len(files),
        "mean_points": float(np.mean(n_points)) if n_points else 0.0,
        "seconds": dt,
        "frames_per_sec": len(files) / dt if dt > 0 else 0.0,
    }
    print_fn(
        f"* {stats['files']} point clouds -> {out_dir} "
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
    parser.add_argument("--preprocessed", action="store_true",
                        help="inputs were already processed by the dataset pipeline; "
                             "skip the host intensity/doppler normalization")
    args = parser.parse_args()
    cfg = load_config(args.config)
    run(cfg, args.input, args.out, batch=args.batch, threshold=args.threshold,
        preprocessed=args.preprocessed)


if __name__ == "__main__":
    main()
