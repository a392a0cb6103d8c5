"""Stage-1 VAE training entry point.

Capability parity with ``main_ae.py`` (:32-218): ``--config`` YAML surface,
per-scene sweep for dict-valued ``dataset.split_file`` (:202-212), config
snapshot into the output dir (:209-217), effective-batch base-LR scaling
(:111-114), checkpoint every ``save_ckpt_freq`` epochs + last (:159-162),
eval every ``eval_freq`` (:165-175), JSONL per-epoch log (:186-190),
eval-only mode loading ``eval.ckpt`` (:138-141).

TPU wiring: one process per host drives all local chips; the loader emits a
global batch of ``dataset.batch_size * device_count`` samples (the reference
semantics of per-GPU batch x world size) which is batch-axis sharded over
the mesh. No torchrun — multi-host runs rendezvous via
``jax.distributed.initialize`` (rald_tpu.parallel.mesh).
"""
from __future__ import annotations

import argparse
import datetime
import time
from pathlib import Path

import jax

from rald_tpu.config import Config, dump_config, expand_experiment_sweep, finalize_dirs, load_config
from rald_tpu.data.loader import DataLoader, ShardedSampler
from rald_tpu.data.registry import get_dataset
from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed, make_mesh
from rald_tpu.train.ae_engine import AEEngine
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.metrics import JsonlLogger, TensorBoardLogger


def build_loaders(cfg, info):
    ds_cfg = cfg.dataset
    train_set = get_dataset(ds_cfg, "train", seed=int(cfg.system.get("seed", 0)))
    val_set = get_dataset(ds_cfg, "val", seed=int(cfg.system.get("seed", 0)))
    world_batch = int(ds_cfg.batch_size) * jax.local_device_count()
    train_loader = DataLoader(
        train_set,
        batch_size=world_batch,
        sampler=ShardedSampler(
            len(train_set), info["world_size"], info["rank"], shuffle=True,
            seed=int(cfg.system.get("seed", 0)),
        ),
        num_workers=int(ds_cfg.get("num_workers", 4)),
        drop_last=True,
    )
    eval_batch = int(ds_cfg.get("eval_batch_size", 1)) * jax.local_device_count()
    val_loader = DataLoader(
        val_set,
        batch_size=eval_batch,
        sampler=ShardedSampler(
            len(val_set), info["world_size"], info["rank"], shuffle=False
        ),
        num_workers=int(ds_cfg.get("eval_num_workers", 1)),
        drop_last=False,
        pad_last=True,  # ragged final batch can't be mesh-sharded
    )
    return train_loader, val_loader, world_batch


def run(cfg: Config) -> dict:
    enable_compilation_cache()
    if cfg.system.get("matmul_precision"):  # 'highest' for strict checkpoint parity
        jax.config.update("jax_default_matmul_precision", cfg.system.matmul_precision)
    info = init_distributed()
    mesh = make_mesh()
    print(f"devices: {jax.device_count()} ({jax.local_device_count()} local), "
          f"process {info['rank']}/{info['world_size']}")

    output_dir = Path(cfg.system.get("output_dir", "./result/ae"))
    if info["is_main_process"]:
        output_dir.mkdir(parents=True, exist_ok=True)
        dump_config(cfg, output_dir / "config.yml")

    train_loader, val_loader, world_batch = build_loaders(cfg, info)
    engine = AEEngine(cfg, mesh)
    state = engine.init_state(len(train_loader), world_batch * info["world_size"])
    print(f"number of params (M): {engine.param_count(state) / 1e6:.2f}")

    ckpt = CheckpointManager(output_dir)
    jsonl = JsonlLogger(output_dir, enabled=info["is_main_process"])
    tb = TensorBoardLogger(cfg.system.get("log_dir"), enabled=info["is_main_process"])

    mode = cfg.system.get("mode", "train")
    if mode == "eval":
        state, _ = ckpt.restore(state, cfg.eval.get("ckpt"))
        return engine.evaluate(state, val_loader, use_ema=cfg.train.get("use_ema", False))

    start_epoch = 0
    if cfg.train.get("resume"):
        state, last_epoch = ckpt.restore(state, cfg.train.resume)
        start_epoch = last_epoch + 1
        print(f"resumed from epoch {last_epoch}")

    epochs = int(cfg.train.epochs)
    save_freq = int(cfg.train.get("save_ckpt_freq", 10))
    eval_freq = int(cfg.train.get("eval_freq", 0) or 0)
    t0 = time.time()
    stats = {}
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        state, train_stats = engine.train_one_epoch(state, train_loader, epoch, log_writer=tb)
        # orbax coordinates multihost saves internally — every process must
        # participate (a rank-0 gate like the reference's save_on_master
        # would deadlock multihost)
        if (epoch + 1) % save_freq == 0 or epoch + 1 == epochs:
            ckpt.save(state, epoch)
        log = {f"train_{k}": v for k, v in train_stats.items()}
        if eval_freq and ((epoch + 1) % eval_freq == 0 or epoch + 1 == epochs):
            eval_stats = engine.evaluate(
                state, val_loader, use_ema=cfg.train.get("use_ema", False)
            )
            log.update({f"val_{k}": v for k, v in eval_stats.items()})
            stats = eval_stats
        log.update({"epoch": epoch})
        jsonl.write(log)
    tb.flush()
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - t0))}")
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU stage-1 VAE training")
    parser.add_argument("--config", required=True, type=str)
    args = parser.parse_args(argv)
    cfg = finalize_dirs(load_config(args.config))
    for scene, sub in expand_experiment_sweep(cfg):
        if scene:
            print(f"=== scene sweep: {scene} ===")
        run(sub)


if __name__ == "__main__":
    main()
