"""Stage-2 diffusion training entry point.

Capability parity with ``main_generation.py`` (:36-281): same skeleton as
the AE main plus frozen-VAE load (:109-120), optional frozen radar-encoder
load (:131-144), EDM criterion, eval-only path (:171-184), latent-cache
training mode (dataset supplies ``cache_latent``).
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
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.gen_engine import GenerationEngine
from rald_tpu.train.metrics import JsonlLogger, TensorBoardLogger


def build_loaders(cfg, info, mode: str):
    import copy

    ds_cfg = cfg.dataset
    # the reference wires cached-latent training via YAML anchors that tie
    # train.use_cache_latent to dataset-level cache keys; when the dataset
    # keys are absent, derive them from the lidar_ae cache fields (the exact
    # layout main_cache writes: cache_path / name / cache_name)
    if bool(cfg.train.get("use_cache_latent", False)) and not ds_cfg.get("use_cache_latent"):
        ds_cfg.use_cache_latent = True
        ds_cfg.cache_latent_base_dir = str(cfg.lidar_ae.cache_path)
        ds_cfg.cache_latent_sub_dir = f"{cfg.lidar_ae.name}/{cfg.lidar_ae.cache_name}"
        print(f"use_cache_latent: auto-wired dataset cache dir "
              f"{ds_cfg.cache_latent_base_dir}/{ds_cfg.cache_latent_sub_dir}")
    seed = int(cfg.system.get("seed", 0))
    world_batch = int(ds_cfg.batch_size) * jax.local_device_count()
    train_loader = None
    if mode == "train":
        train_set = get_dataset(ds_cfg, "train", seed=seed)
        # training needs no query points (reference main_generation.py:55)
        train_set.set_load_query(False)
        train_loader = DataLoader(
            train_set,
            batch_size=world_batch,
            sampler=ShardedSampler(len(train_set), info["world_size"], info["rank"],
                                   shuffle=True, seed=seed),
            num_workers=int(ds_cfg.get("num_workers", 4)),
            drop_last=True,
        )
    # eval decodes from sampled tokens — cached train-split latents don't
    # exist for val/test sequences, so never require them here
    eval_cfg = copy.deepcopy(ds_cfg)
    eval_cfg.use_cache_latent = False
    # eval.use_test_set evaluates on the test split during training
    # (reference main_generation.py:51-54)
    use_test = mode == "eval" or bool(cfg.get("eval", {}).get("use_test_set", False))
    test_set = get_dataset(eval_cfg, "test" if use_test else "val", seed=seed)
    eval_loader = DataLoader(
        test_set,
        batch_size=int(ds_cfg.get("eval_batch_size", 1)),
        sampler=ShardedSampler(len(test_set), info["world_size"], info["rank"], shuffle=False),
        num_workers=int(ds_cfg.get("eval_num_workers", 1)),
        drop_last=False,
        pad_last=True,  # keep every batch the same shape (one compiled program)
    )
    return train_loader, eval_loader, world_batch


def load_frozen_modules(cfg, engine: GenerationEngine):
    """Frozen VAE (+ radar encoder) weights (reference :109-144).

    Checkpoints are orbax dirs produced by our trainers; ``lidar_ae.ckpt``
    may point at a stage-1 ``checkpoint-N`` directory. Restored arrays are
    re-placed replicated over the mesh — orbax commits them to one device,
    which conflicts with mesh-replicated model params inside one jit.
    """
    from rald_tpu.parallel.mesh import replicated

    def replicate(tree):
        return jax.device_put(tree, replicated(engine.mesh))

    vae_params = engine.init_vae_params()
    vae_ckpt = cfg.lidar_ae.get("ckpt")
    if vae_ckpt and Path(vae_ckpt).exists():
        from rald_tpu.train.checkpoint import CheckpointManager as CM

        vae_params = replicate(CM(Path(vae_ckpt).parent).restore_params(vae_params, vae_ckpt))
        print(f"Loaded frozen VAE from {vae_ckpt}")
    else:
        print("WARNING: lidar_ae.ckpt missing — using randomly initialized frozen VAE")

    radar_enc_params = None
    if engine.frozen_radar_enc:
        radar_enc_params = engine.init_radar_enc_params()
        enc_ckpt = cfg.radar_enc.get("ckpt")
        if enc_ckpt and Path(enc_ckpt).exists():
            from rald_tpu.train.checkpoint import CheckpointManager as CM

            radar_enc_params = replicate(
                CM(Path(enc_ckpt).parent).restore_params(radar_enc_params, enc_ckpt)
            )
            print(f"Loaded frozen radar encoder from {enc_ckpt}")
        else:
            print("WARNING: radar_enc.ckpt missing — using randomly initialized encoder")
    return vae_params, radar_enc_params


def run(cfg: Config) -> dict:
    enable_compilation_cache()
    if cfg.system.get("matmul_precision"):  # 'highest' for strict checkpoint parity
        jax.config.update("jax_default_matmul_precision", cfg.system.matmul_precision)
    info = init_distributed()
    mesh = make_mesh()
    mode = cfg.system.get("mode", "train")
    output_dir = Path(cfg.system.get("output_dir", "./result/generation"))
    if info["is_main_process"]:
        output_dir.mkdir(parents=True, exist_ok=True)
        dump_config(cfg, output_dir / "config.yml")

    train_loader, eval_loader, world_batch = build_loaders(cfg, info, mode)
    engine = GenerationEngine(cfg, mesh)
    steps_per_epoch = len(train_loader) if train_loader is not None else 1
    state = engine.init_state(steps_per_epoch, world_batch * info["world_size"])
    print(f"number of params (M): {engine.param_count(state) / 1e6:.2f}")

    vae_params, radar_enc_params = load_frozen_modules(cfg, engine)
    ckpt = CheckpointManager(output_dir)
    jsonl = JsonlLogger(output_dir, enabled=info["is_main_process"])
    tb = TensorBoardLogger(cfg.system.get("log_dir"), enabled=info["is_main_process"])

    if mode == "eval":
        eval_ckpt = cfg.eval.get("ckpt")
        if eval_ckpt and Path(str(eval_ckpt)).exists():
            state, _ = ckpt.restore(state, eval_ckpt)
        return engine.evaluate(
            state, eval_loader, vae_params, radar_enc_params,
            use_ema=cfg.train.get("use_ema", False),
        )

    start_epoch = 0
    if cfg.train.get("resume") and Path(str(cfg.train.resume)).exists():
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
        state, train_stats = engine.train_one_epoch(
            state, train_loader, epoch,
            vae_params=None if engine.use_cache_latent else vae_params,
            radar_enc_params=radar_enc_params, log_writer=tb,
        )
        # all processes participate in orbax saves (multihost coordination)
        if (epoch + 1) % save_freq == 0 or epoch + 1 == epochs:
            ckpt.save(state, epoch)
        log = {f"train_{k}": v for k, v in train_stats.items()}
        if eval_freq and ((epoch + 1) % eval_freq == 0 or epoch + 1 == epochs):
            eval_stats = engine.evaluate(
                state, eval_loader, vae_params, radar_enc_params,
                use_ema=cfg.train.get("use_ema", False),
            )
            log.update({f"val_{k}": v for k, v in eval_stats.items()})
            stats = eval_stats
        log.update({"epoch": epoch})
        jsonl.write(log)
    tb.flush()
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - t0))}")
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU stage-2 diffusion training")
    parser.add_argument("--config", required=True, type=str)
    args = parser.parse_args(argv)
    cfg = finalize_dirs(load_config(args.config))
    for scene, sub in expand_experiment_sweep(cfg):
        if scene:
            print(f"=== scene sweep: {scene} ===")
        run(sub)


if __name__ == "__main__":
    main()
