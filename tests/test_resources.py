"""Format compatibility with the released resource tarballs (component #35).

The reference ships ``resource/sequences_idx.tar.gz`` (radar<->lidar frame
alignment indices) and ``resource/split_files.tar.gz`` (train/val/test scene
splits) that users extract into the dataset tree (reference README.md:21-22).
These tests consume the REAL tarballs from the reference checkout (skipped
when absent) and drive our loaders on their exact formats, closing the
"would our code read the real artifacts?" risk that synthetic fixtures
cannot.
"""
import json
import tarfile
from pathlib import Path

import numpy as np
import pytest

REF_RESOURCE = Path("/root/reference/resource")

pytestmark = pytest.mark.skipif(
    not REF_RESOURCE.exists(), reason="reference resource tarballs not available"
)


@pytest.fixture(scope="module")
def extracted(tmp_path_factory):
    root = tmp_path_factory.mktemp("resources")
    with tarfile.open(REF_RESOURCE / "sequences_idx.tar.gz") as t:
        t.extractall(root / "idx", filter="data")
    with tarfile.open(REF_RESOURCE / "split_files.tar.gz") as t:
        t.extractall(root / "splits", filter="data")
    return root


def test_split_files_schema(extracted):
    """Every released split JSON has the train/val/test -> [seq names] shape
    our ColoRadarDataset.load_split consumes (coloradar.py:126-129)."""
    split_files = sorted((extracted / "splits").glob("*.json"))
    assert len(split_files) >= 9, split_files  # indoor/outdoor + 7 mini scenes
    for p in split_files:
        with open(p) as f:
            split = json.load(f)
        assert set(split) >= {"train", "val", "test"}, p
        for k in ("train", "val", "test"):
            assert isinstance(split[k], list), p
            assert all(isinstance(s, str) for s in split[k]), p


def test_radar_index_files_parse(extracted):
    """Our preprocess CLI's read_index parses every real alignment file."""
    from rald_tpu.cli.preprocess_radar import read_index

    seq_dirs = sorted(d for d in (extracted / "idx").iterdir() if d.is_dir())
    assert len(seq_dirs) >= 20, seq_dirs
    for seq_dir in seq_dirs:
        idx = read_index(seq_dir)
        assert len(idx) > 0, seq_dir
        arr = np.asarray(idx)
        assert (arr >= 0).all(), seq_dir
        assert (np.diff(arr) >= 0).all(), f"non-monotonic alignment in {seq_dir}"


def test_real_split_drives_dataset(extracted):
    """A real split JSON + real sequence names drive ColoRadarDataset end to
    end (tiny stand-in frames; the on-disk layout is the real one)."""
    from rald_tpu.config import Config
    from rald_tpu.data.coloradar import ColoRadarDataset

    split_path = extracted / "splits" / "split_mini_aspen_june.json"
    with open(split_path) as f:
        split = json.load(f)

    root = extracted / "tree"
    rng = np.random.default_rng(0)
    frames = 2
    for seqs in split.values():
        for seq in seqs:
            lidar_dir = root / seq / ColoRadarDataset.LIDAR_DIR["scRadar"]
            radar_dir = root / seq / ColoRadarDataset.RADAR_DIR["scRadar"]
            lidar_dir.mkdir(parents=True, exist_ok=True)
            radar_dir.mkdir(parents=True, exist_ok=True)
            for i in range(frames):
                pts = rng.uniform([1, -3, -1], [10, 3, 1], size=(2000, 3))
                pts.astype(np.float32).tofile(lidar_dir / f"{i:04d}.bin")
                cube = rng.normal(size=(128, 8, 2, 3)).astype(np.float32)
                cube.tofile(radar_dir / f"{i:04d}.bin")
    (root / split_path.name).write_bytes(split_path.read_bytes())

    cfg = Config(
        {
            "split_file": split_path.name,
            "lidar": {
                "pc_range": [0, -90, -20, 15.8, 90, 20],
                "num_point_features": 3,
                "voxel_size": [0.05, 0.25, 0.5],
                "max_points_per_voxel": 10,
                "max_number_of_voxels": 50000,
                "sampling": True,
                "num_samples": 512,
                "query_ratio": 0.0625,
                "norm_isotropy": False,
                "norm_anisotropy": True,
                "cache_voxel": False,
                "view_cone_mode": True,
            },
            "radar": {
                "input_r_dim": 128, "input_a_dim": 8, "input_e_dim": 2,
                "input_ch": 3, "upsample": False,
                "norm_intensity": True, "max_intensity": 45,
                "norm_dopp": True, "max_dopp": 2.4958,
            },
        }
    )
    for loader_type in ("train", "test"):
        ds = ColoRadarDataset(root, cfg, loader_type=loader_type)
        assert len(ds) == frames * len(split[loader_type])
        item = ds[0]
        assert item["lidar_points"].shape == (512, 3)
        # validity-masked intensity+doppler after process_radar_cube
        assert item["radar_cube"].shape == (128, 8, 2, 2)
