"""Convert a reference PyTorch checkpoint into a runnable orbax checkpoint.

The released RaLD weights (reference README.md:62-63) are ``.pth`` files of
``KLAutoEncoder`` / ``EDMPrecond`` / ``RadarAutoencoder``. This tool maps
them (:mod:`rald_tpu.convert`) onto the model the given experiment YAML
builds and writes a ``checkpoint-<epoch>`` directory our trainers/evaluators
load directly (``train.resume``, ``eval.ckpt``, ``lidar_ae.ckpt``).

    python -m rald_tpu.cli.convert_ckpt --config configs/ae/....yml \
        --kind ae --torch-ckpt checkpoint-149.pth --out ./converted

Both ``params`` and ``ema_params`` are set to the converted weights (the
reference merges EMA into the saved state_dict, misc.py:298-304).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from rald_tpu.config import finalize_dirs, load_config
from rald_tpu.convert.torch_ckpt import (
    convert_edm_state_dict,
    convert_radar_autoencoder_state_dict,
    convert_vae_state_dict,
    load_torch_checkpoint,
)
from rald_tpu.train.checkpoint import CheckpointManager


def run(cfg, kind: str, torch_ckpt: str, out_dir: str, epoch: int = 0, state_key: str = "model"):
    sd = load_torch_checkpoint(torch_ckpt, key=state_key)

    if kind == "ae":
        from rald_tpu.train.ae_engine import AEEngine

        engine = AEEngine(cfg)
        state = engine.init_state(steps_per_epoch=1, world_batch=1)
        params = convert_vae_state_dict(
            sd, depth=engine.model.depth, query_type=engine.model.query_type
        )
    elif kind == "generation":
        from rald_tpu.train.gen_engine import GenerationEngine

        engine = GenerationEngine(cfg)
        state = engine.init_state(steps_per_epoch=1, world_batch=1)
        params = convert_edm_state_dict(sd, depth=engine.model.depth)
    elif kind == "radar_enc":
        from rald_tpu.train.gen_engine import GenerationEngine

        engine = GenerationEngine(cfg)
        # radar AE checkpoints restore via restore_params(key='params')
        params = convert_radar_autoencoder_state_dict(sd)
        state = None
    else:
        raise ValueError(f"unknown kind {kind}")

    import jax

    mgr = CheckpointManager(out_dir)
    if state is None:
        # bare param tree (frozen-module checkpoints)
        import orbax.checkpoint as ocp

        path = (Path(out_dir) / f"checkpoint-{epoch}").resolve()
        ocp.StandardCheckpointer().save(path, {"params": params}, force=True)
    else:
        _assert_structures_match(state.params, params)
        converted = jax.tree_util.tree_map(
            lambda t, s: s.astype(t.dtype).reshape(t.shape), state.params, params
        )
        state = state.replace(params=converted, ema_params=converted)
        path = mgr.save(state, epoch)
    print(f"converted {torch_ckpt} -> {path}")
    return path


def _assert_structures_match(target, converted):
    import jax

    t_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = t_paths - c_paths
    extra = c_paths - t_paths
    if missing or extra:
        raise ValueError(
            f"param structure mismatch:\n  missing from checkpoint: {sorted(missing)[:8]}"
            f"\n  unexpected in checkpoint: {sorted(extra)[:8]}"
        )


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU torch checkpoint conversion")
    parser.add_argument("--config", required=True)
    parser.add_argument("--kind", required=True, choices=["ae", "generation", "radar_enc"])
    parser.add_argument("--torch-ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--epoch", type=int, default=0)
    parser.add_argument("--state-key", default="model")
    args = parser.parse_args(argv)
    run(finalize_dirs(load_config(args.config)), args.kind, args.torch_ckpt, args.out,
        args.epoch, args.state_key)


if __name__ == "__main__":
    main()
