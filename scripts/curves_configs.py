"""Build the synthetic convergence-run assets (dataset + YAML configs).

Produces /tmp/curves/{data, ae.yml, gen.yml}: full-size models (the
reference's kl_d512_m512_l32_mix VAE and kl_d512_m512_l32_d24_edm DiT) on a
scene-correlated synthetic ColoRadar tree, sized so stage-1 + stage-2 train
for a few hours on one v5e chip with per-epoch JSONL metrics for
docs/CURVES.md.

Run: PYTHONPATH=/root/repo python scripts/curves_configs.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import yaml  # noqa: E402

from rald_tpu.config import Config  # noqa: E402
from rald_tpu.data.synthetic import make_synthetic_coloradar, synthetic_dataset_config  # noqa: E402

ROOT = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/curves")


def main():
    data = ROOT / "data"
    if not (data / "split_synth.json").exists():
        make_synthetic_coloradar(
            data, num_train_seqs=4, num_eval_seqs=1, frames_per_seq=50,
            points_per_frame=16000, radar_shape=(128, 8, 2),
        )
        print("dataset written:", data)

    ds = synthetic_dataset_config(data)
    ds.batch_size = 8
    ds.eval_batch_size = 8
    ds.num_workers = 2
    ds.radar.upsample_on_device = True
    ds.use_query_helper = True
    ds.query_aug_num = 2048
    ds.query_aug_scale = 2

    ae = Config({
        "system": {"seed": 0, "mode": "train", "output_dir": str(ROOT / "out_ae"),
                   "log_dir": None, "compute_dtype": "bfloat16"},
        "dataset": ds,
        "train": {
            "epochs": 60, "warmup_epochs": 2, "lr": 5e-4, "blr": 1e-4,
            "min_lr": 1e-6, "clip_grad": 10, "accum_iter": 1,
            "vol_weight": 0.1, "near_weight": 1.0,
            "save_ckpt_freq": 20, "eval_freq": 4, "use_ema": False,
        },
        "lidar_ae": {"name": "kl_d512_m512_l32_mix"},
        "eval": {"inference": {"num_query_points": 4096}, "freq": 4},
    })

    gen = Config({
        "system": {"seed": 0, "mode": "train", "output_dir": str(ROOT / "out_gen"),
                   "log_dir": None, "compute_dtype": "bfloat16"},
        "dataset": ds,
        "train": {
            "epochs": 120, "warmup_epochs": 4, "lr": 5e-4, "blr": 1e-4,
            "min_lr": 1e-6, "clip_grad": 10, "accum_iter": 1,
            "save_ckpt_freq": 40, "eval_freq": 4, "use_ema": True,
            "use_cache_latent": True,
        },
        "ar_model": {
            "name": "kl_d512_m512_l32_d24_edm",
            "configs": {
                "cond_type": "radar", "use_radar_cond": True,
                "use_radar_enc": True, "unfreeze_radar_enc": True,
                "radar_token_channel": 512,
                "enc_radar_r_dim": 8, "enc_radar_a_dim": 4, "enc_radar_e_dim": 2,
                "enc_radar_ch": 16, "enc_hidden_ch": 64,
            },
        },
        "lidar_ae": {
            "name": "kl_d512_m512_l32_mix",
            "ckpt": str(ROOT / "out_ae" / "checkpoint-59"),
            "latent_std": 1,
            "cache_path": str(ROOT / "latent_cache"),
            "cache_name": "curves",
        },
        "radar_enc": {"name": "ae_ch64_mult5_n2_d16", "ckpt": None},
        "eval": {
            "freq": 4, "use_test_set": False,
            "inference": {
                "num_query_points": 100000,
                "query_helper": True,
                "refine_query": False,
            },
            "store_pc": False,
        },
    })

    for name, c in (("ae", ae), ("gen", gen)):
        d = c.to_dict() if hasattr(c, "to_dict") else dict(c)
        with open(ROOT / f"{name}.yml", "w") as f:
            yaml.safe_dump(d, f)
    print("configs written:", ROOT / "ae.yml", ROOT / "gen.yml")


if __name__ == "__main__":
    main()
