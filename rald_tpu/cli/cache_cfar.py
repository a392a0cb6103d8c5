"""CFAR helper-point caching: high-res cubes -> sparse polar points.

Capability parity with ``dataset_preprocessor/cache_test_cfar.py``
(:77-178) and the HUST variant ``cache_test_cfar_hust_radar.py``
(:81-185, identical flow): per test frame, take the intensity channel of
the (128, 32, 16) high-res cube, trilinearly upsample to (256, 256, 128),
pick a per-range-slice weighted budget of top-k peaks (total 8e5), map
indices to polar coordinates (arcsin angle axes with
``WAVELENGTH_TO_APERTURE_RATIO``), FOV-filter, write
``single_chip/radar_cfar_low_thrd/%04d.bin``.

TPU re-design: upsample + budget + top-k + coord mapping is one fused jit
(:func:`rald_tpu.dsp.cfar_points.cfar_points_from_cube`) — the reference's
per-range-slice Python argpartition loop (cache_test_cfar_utils.py:55-98)
becomes a batched ``lax.top_k``. Only the final FOV compaction stays on the
host (ragged output).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from rald_tpu.config import load_config
from rald_tpu.dsp.cfar_points import cfar_points_from_cube
from rald_tpu.parallel.mesh import enable_compilation_cache
from rald_tpu.utils.concurrent import thread_map


def run(cfg, mode: str = "sc") -> int:
    enable_compilation_cache()
    if mode != "sc":
        raise NotImplementedError("cascade radar is not supported (reference parity)")
    out_base = Path(cfg.output_dir)
    radar_cfg = cfg.single_chip_mode.radar
    cfar = radar_cfg.cfar
    r_in, a_in, e_in = int(cfar.input_r_dim), int(cfar.input_a_dim), int(cfar.input_e_dim)
    tgt = (int(cfar.tgt_r_dim), int(cfar.tgt_a_dim), int(cfar.tgt_e_dim))
    total = int(float(cfar.cfar_num_point))

    # max range from the radar chirp config (cache_test_cfar.py uses the
    # same derived quantity via read_radar_map_bin's config)
    from rald_tpu.dsp.params import RadarParams

    params = RadarParams.from_yaml(radar_cfg.config)
    max_range = params.max_range
    fov = cfg.single_chip_mode.lidar.FOV
    limits = [
        [0.0, float(fov.max_range)],
        [float(fov.az_range[0]), float(fov.az_range[1])],
        [float(fov.el_range[0]), float(fov.el_range[1])],
    ]

    split_file = cfg.get("split_file")
    if split_file:
        with open(out_base / split_file) as f:
            seq_names = json.load(f)[cfg.get("split", "test")]
        seq_dirs = [out_base / s for s in seq_names]
    else:
        seq_dirs = [d for d in out_base.iterdir() if d.is_dir()]
    print(f"Caching CFAR points for {len(seq_dirs)} sequences")

    from rald_tpu import geometry as geo

    total_frames = 0
    for seq_dir in seq_dirs:
        cube_dir = seq_dir / "single_chip" / "radarcube_high_res"
        out_dir = seq_dir / "single_chip" / "radar_cfar_low_thrd"
        out_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(cube_dir.glob("*.bin"))

        def work(f: Path):
            cube = np.fromfile(f, dtype=np.float32).reshape(r_in, a_in, e_in, -1)
            intensity = jnp.asarray(cube[..., 0])
            coords, _ = cfar_points_from_cube(intensity, *tgt, total, max_range)
            coords = np.asarray(coords)
            coords = geo.filter_points_polar(coords, limits)
            coords.astype(np.float32).tofile(out_dir / f"{f.stem}.bin")

        thread_map(work, files, workers=4, desc=seq_dir.name)
        print(f"{seq_dir.name}: {len(files)} frames -> {out_dir}")
        total_frames += len(files)
    return total_frames


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU CFAR helper-point caching")
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--mode", default="sc", choices=["sc", "cc"])
    args = parser.parse_args(argv)
    run(load_config(args.config), mode=args.mode)


if __name__ == "__main__":
    main()
