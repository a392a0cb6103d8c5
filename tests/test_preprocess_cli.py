"""End-to-end preprocessing chain: raw ColoRadar-layout tree -> processed
dataset the training pipeline can consume.

Writes a synthetic *raw* tree (int16 IQ ADC frames + 4-attr lidar scans +
alignment index files), then drives the CLI chain:
preprocess_lidar -> preprocess_radar (train + --test-set) -> cache_cfar ->
dump_voxel, and finally constructs ColoRadarDataset on the output.
"""
import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from rald_tpu.config import Config

SEQS = ["raw_seq_0", "raw_seq_1"]
FRAMES = 3
RAW_FRAMES = 5  # more raw frames than aligned ones (alignment subsamples)


def _chirp_yaml(path: Path, az_fft=8, el_fft=2):
    cfg = {
        "numTxChan": 3, "numRxChan": 4, "numChirpsPerFrame": 32, "numAdcSamples": 64,
        "StartFrequency": 77.0e9, "Ideltime": 110.0e-6, "F_design": 76.8,
        "range_fftsize": 64, "doppler_fftsize": 32,
        "ANGLE_fftsize": az_fft, "ELEVATION_fftsize": el_fft,
        "Fs": 10_666_000.0, "SamplePerChripUp": 64, "Kr": 1.00000000377e14,
        "chirpRampTime": 13.0e-6, "adc_start_time": 7.0e-6,
        "angles_DOA_az": [-90, 90], "angles_DOA_ele": [-20, 20],
    }
    path.write_text(yaml.safe_dump(cfg))


def _antenna_file(path: Path):
    # format: "{tx|rx} idx az el" in half-wavelength units (radar.py:36-54)
    lines = ["# layout"]
    for i in range(4):
        lines.append(f"rx {i} {i} 0")
    for i, (az, el) in enumerate([(0, 0), (2, 1), (4, 0)]):
        lines.append(f"tx {i} {az} {el}")
    path.write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_coloradar")
    rng = np.random.default_rng(0)
    for seq in SEQS:
        adc_dir = root / seq / "single_chip" / "adc_samples" / "data"
        adc_dir.mkdir(parents=True)
        for i in range(RAW_FRAMES):
            adc = rng.integers(-200, 200, size=(3, 4, 32, 64, 2), dtype=np.int16)
            adc.tofile(adc_dir / f"frame_{i}.bin")
        idx = [0, 2, 4][:FRAMES]
        (root / seq / "single_chip" / "adc_samples" / "radar_index_sequence.txt").write_text(
            "\n".join(str(i) for i in idx)
        )
        lidar_dir = root / seq / "lidar" / "pointclouds"
        lidar_dir.mkdir(parents=True)
        for i in range(RAW_FRAMES):
            pts = rng.uniform(-5, 10, size=(2000, 4)).astype(np.float32)
            pts[:50] = 0.0  # zero returns to be dropped
            pts.tofile(lidar_dir / f"lidar_pointcloud_{i}.bin")
        (root / seq / "lidar" / "lidar_index_sequence.txt").write_text(
            "\n".join(str(i) for i in idx)
        )
    return root


@pytest.fixture(scope="module")
def prep_cfg(raw_root, tmp_path_factory):
    """Preprocessing config matching coloradar_config*.yaml keys."""
    out = tmp_path_factory.mktemp("processed")
    voxel_out = tmp_path_factory.mktemp("voxel_cache")
    cfg_dir = tmp_path_factory.mktemp("cfg")
    _chirp_yaml(cfg_dir / "chirp.yml")
    _chirp_yaml(cfg_dir / "chirp_test.yml", az_fft=16, el_fft=8)
    _antenna_file(cfg_dir / "antenna.txt")
    split = {"train": [SEQS[0]], "val": [], "test": [SEQS[1]]}
    (out / "split_synth.json").write_text(json.dumps(split))
    return Config(
        {
            "root_dir": str(raw_root),
            "output_dir": str(out),
            "voxel_output_dir": str(voxel_out),
            "split_file": "split_synth.json",
            "split": "test",
            "num_workers": 1,
            "single_chip_mode": {
                "lidar": {
                    "FOV": {"max_range": 15.86, "az_range": [-90, 90], "el_range": [-20, 20]},
                    "pc_range": [0, -90, -20, 15.8, 90, 20],
                    "voxel_size": [0.05, 0.25, 0.5],
                    "voxel_max_num_points": 10,
                    "max_voxels": 50000,
                },
                "radar": {
                    "config": str(cfg_dir / "chirp.yml"),
                    "antenna_file_path": str(cfg_dir / "antenna.txt"),
                    "cfar": {
                        "input_r_dim": 64, "input_a_dim": 16, "input_e_dim": 8,
                        "tgt_r_dim": 64, "tgt_a_dim": 64, "tgt_e_dim": 32,
                        "cfar_num_point": 4096,
                    },
                },
            },
        }
    )


@pytest.fixture(scope="module")
def processed(prep_cfg):
    """Run the full preprocessing chain once; return per-step counts."""
    from rald_tpu.cli import cache_cfar, preprocess_lidar, preprocess_radar

    counts = {"lidar": preprocess_lidar.run(prep_cfg)}
    counts["radar"] = preprocess_radar.run(prep_cfg, test_set=False)
    hires_cfg = Config(prep_cfg.to_dict())
    hires_cfg.single_chip_mode.radar.config = hires_cfg.single_chip_mode.radar.config.replace(
        "chirp.yml", "chirp_test.yml"
    )
    counts["radar_hires"] = preprocess_radar.run(hires_cfg, test_set=True)
    counts["cfar"] = cache_cfar.run(prep_cfg)
    return counts


class TestPreprocessChain:
    def test_lidar(self, prep_cfg, processed):
        n = processed["lidar"]
        assert n == len(SEQS) * FRAMES
        out = Path(prep_cfg.output_dir) / SEQS[0] / "lidar_sc"
        files = sorted(out.glob("*.bin"))
        assert [f.name for f in files] == [f"{i:04d}.bin" for i in range(FRAMES)]
        pts = np.fromfile(files[0], dtype=np.float32).reshape(-1, 3)
        assert len(pts) > 0
        # all inside the FOV
        from rald_tpu import geometry as geo

        polar = geo.cartesian2polar(pts)
        assert polar[:, 0].max() <= 15.87
        assert np.abs(polar[:, 1]).max() <= 90.01
        assert np.abs(polar[:, 2]).max() <= 20.01

    def test_radar_train_cubes(self, prep_cfg, processed):
        assert processed["radar"] == len(SEQS) * FRAMES
        out = Path(prep_cfg.output_dir) / SEQS[0] / "single_chip" / "radarcube_raw"
        cube = np.fromfile(out / "0000.bin", dtype=np.float32)
        # head/tail 5% range bins are ZEROED, not cropped (radar_preprocessing.py:42-43)
        assert cube.size == 64 * 8 * 2 * 3
        assert np.isfinite(cube).all()

    def test_radar_highres_test_set(self, prep_cfg, processed):
        assert processed["radar_hires"] == FRAMES  # test split only = 1 seq
        out = Path(prep_cfg.output_dir) / SEQS[1] / "single_chip" / "radarcube_high_res"
        cube = np.fromfile(out / "0000.bin", dtype=np.float32)
        assert cube.size == 64 * 16 * 8 * 3

    def test_cache_cfar(self, prep_cfg, processed):
        assert processed["cfar"] == FRAMES
        out = Path(prep_cfg.output_dir) / SEQS[1] / "single_chip" / "radar_cfar_low_thrd"
        pts = np.fromfile(out / "0000.bin", dtype=np.float32).reshape(-1, 3)
        assert 0 < len(pts) <= 4096
        assert pts[:, 0].max() <= 15.87  # FOV-filtered polar ranges

    def test_dump_voxel_and_dataset_consumes_output(self, prep_cfg, processed):
        from rald_tpu.cli.dump_voxel import run

        n = run(prep_cfg, mode="sc_cone")
        assert n == len(SEQS) * FRAMES
        link = Path(prep_cfg.output_dir) / SEQS[0] / "cone_sc_0.05_0.25_0.5"
        assert link.is_symlink() and len(list(link.glob("*.npy"))) == FRAMES

        # the processed tree is directly consumable by the training dataset
        from rald_tpu.data.registry import get_dataset

        ds_cfg = Config(
            {
                "dataset_name": "AlignedColoRadar",
                "root_dir": prep_cfg.output_dir,
                "split_file": "split_synth.json",
                "radar_type": "scRadar",
                "lidar": {
                    "pc_range": [0, -90, -20, 15.8, 90, 20],
                    "num_point_features": 3,
                    "voxel_size": [0.05, 0.25, 0.5],
                    "max_points_per_voxel": 10,
                    "max_number_of_voxels": 50000,
                    "sampling": True,
                    "num_samples": 256,
                    "query_ratio": 0.0625,
                    "norm_isotropy": False,
                    "norm_anisotropy": True,
                    "cache_voxel": True,
                    "view_cone_mode": True,
                },
                "radar": {
                    "input_r_dim": 64, "input_a_dim": 8, "input_e_dim": 2, "input_ch": 3,
                    "upsample": False, "norm_intensity": True, "max_intensity": 45,
                    "norm_dopp": True, "max_dopp": 2.4958,
                },
            }
        )
        ds = get_dataset(ds_cfg, "train")
        assert len(ds) == FRAMES
        item = ds[0]
        assert item["lidar_points"].shape == (256, 3)
        assert item["radar_cube"].shape == (64, 8, 2, 2)  # intensity + masked velocity
        assert np.isfinite(item["radar_cube"]).all()

    def test_relink(self, raw_root, tmp_path):
        from rald_tpu.cli.relink import create_baselink

        dst = tmp_path / "linked"
        # raw tree lacks calib/; create it so the special-dir link works
        (raw_root / "calib").mkdir(exist_ok=True)
        n = create_baselink(raw_root, dst)
        assert n == len(SEQS)
        assert (dst / SEQS[0] / "single_chip").is_symlink()


class TestUtils:
    def test_imap_and_thread_map(self):
        from rald_tpu.utils.concurrent import imap_tqdm, thread_map

        assert imap_tqdm(lambda x: x * 2, [1, 2, 3], processes=1) == [2, 4, 6]
        assert thread_map(lambda x: x + 1, [1, 2, 3], workers=2) == [2, 3, 4]

    def test_async_pool(self):
        from rald_tpu.utils.concurrent import AsyncWorkerPool

        with AsyncWorkerPool(2) as pool:
            futs = [pool.submit(lambda i=i: i * i) for i in range(4)]
        assert [f.result() for f in futs] == [0, 1, 4, 9]

    def test_shell_cmd(self):
        from rald_tpu.utils.concurrent import shell_cmd

        assert shell_cmd("echo hi").strip() == "hi"

    def test_interp_pose(self):
        from rald_tpu.utils.interpolate import interp_pose
        from scipy.spatial.transform import Rotation

        t = np.array([0.0, 1.0])
        poses = np.tile(np.eye(4), (2, 1, 1))
        poses[1, :3, :3] = Rotation.from_euler("z", 90, degrees=True).as_matrix()
        poses[1, :3, 3] = [2.0, 0.0, 0.0]
        out = interp_pose(poses, t, np.array([0.5]))
        np.testing.assert_allclose(out[0, :3, 3], [1.0, 0.0, 0.0], atol=1e-9)
        ang = Rotation.from_matrix(out[0, :3, :3]).as_euler("zyx", degrees=True)[0]
        assert abs(ang - 45.0) < 1e-6
