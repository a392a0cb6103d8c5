"""Latent-cache entry point (reference ``main_cache.py:29-106``).

One-shot: run the frozen stage-1 VAE over the train split (queries on,
radar off) and write per-frame latents as ``<seq>/<frame>.npz`` with key
``res_tokens`` under ``lidar_ae.cache_path / lidar_ae.name / cache_name``.
"""
from __future__ import annotations

import argparse
import datetime
import time
from pathlib import Path

import jax

from rald_tpu.config import finalize_dirs, load_config
from rald_tpu.data.loader import DataLoader, ShardedSampler
from rald_tpu.data.registry import get_dataset
from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed, make_mesh
from rald_tpu.train.gen_engine import GenerationEngine


def run(cfg) -> Path:
    enable_compilation_cache()
    if cfg.system.get("matmul_precision"):  # 'highest' for strict checkpoint parity
        jax.config.update("jax_default_matmul_precision", cfg.system.matmul_precision)
    info = init_distributed()
    mesh = make_mesh()
    dataset = get_dataset(cfg.dataset, "train", seed=int(cfg.system.get("seed", 0)))
    dataset.set_load_query(True)
    dataset.set_load_radar(False)
    loader = DataLoader(
        dataset,
        batch_size=int(cfg.dataset.batch_size),
        sampler=ShardedSampler(len(dataset), info["world_size"], info["rank"], shuffle=False),
        num_workers=int(cfg.dataset.get("num_workers", 4)),
        drop_last=False,
    )

    engine = GenerationEngine(cfg, mesh)
    vae_params = engine.init_vae_params()
    ckpt = cfg.lidar_ae.get("ckpt")
    if ckpt and Path(str(ckpt)).exists():
        from rald_tpu.train.checkpoint import CheckpointManager

        vae_params = CheckpointManager(Path(ckpt).parent).restore_params(vae_params, ckpt)
        print(f"Loaded VAE from {ckpt}")

    cache_path = (
        Path(cfg.lidar_ae.cache_path) / cfg.lidar_ae.name / cfg.lidar_ae.cache_name
    )
    cache_path.mkdir(parents=True, exist_ok=True)
    print(f"Cache path: {cache_path}")
    t0 = time.time()
    stats = engine.cache_latents(vae_params, loader, cache_path)
    print(f"Caching time {datetime.timedelta(seconds=int(time.time() - t0))} iou={stats.get('iou')}")
    return cache_path


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU latent caching")
    parser.add_argument("--config", required=True, type=str)
    args = parser.parse_args(argv)
    run(finalize_dirs(load_config(args.config)))


if __name__ == "__main__":
    main()
