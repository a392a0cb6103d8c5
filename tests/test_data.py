import numpy as np
import pytest

from rald_tpu.data import (
    ColoRadarDataset,
    DataLoader,
    ShardedSampler,
    aug_query_helper,
    empty_voxel_centers,
    get_dataset,
    process_radar_cube,
    sample_train_queries,
    voxelize,
)
from rald_tpu.data.synthetic import make_synthetic_coloradar, synthetic_dataset_config

PC_RANGE = [0.0, -2.0, -1.0, 4.0, 2.0, 1.0]
VOXEL = [0.5, 0.5, 0.5]


def test_voxelize_basic():
    pts = np.array(
        [
            [0.1, 0.1, 0.1],    # voxel (0, 4, 2)
            [0.2, 0.2, 0.2],    # same voxel
            [3.9, 1.9, 0.9],    # last voxel
            [10.0, 0.0, 0.0],   # out of range -> dropped
            [0.15, 0.05, 0.05], # first voxel again
        ],
        dtype=np.float32,
    )
    g = voxelize(pts, VOXEL, PC_RANGE, max_points_per_voxel=2, max_voxels=10)
    assert g.coords.shape == (2, 3)
    # first-appearance order; coords are (z, y, x)
    np.testing.assert_array_equal(g.coords[0], [2, 4, 0])
    np.testing.assert_array_equal(g.coords[1], [3, 7, 7])
    assert g.num_points[0] == 2  # capped at max_points_per_voxel
    assert g.num_points[1] == 1
    np.testing.assert_allclose(g.voxels[0, 0], pts[0])
    np.testing.assert_allclose(g.voxels[0, 1], pts[1])


def test_voxelize_max_voxels_cap():
    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -2, -1], [4, 2, 1], size=(5000, 3)).astype(np.float32)
    g = voxelize(pts, VOXEL, PC_RANGE, max_points_per_voxel=5, max_voxels=7)
    assert g.coords.shape[0] == 7
    assert g.voxels.shape == (7, 5, 3)


def test_voxelize_matches_spconv_if_available():
    spconv_utils = pytest.importorskip("spconv.utils")
    from cumm import tensorview as tv

    rng = np.random.default_rng(1)
    pts = rng.uniform([0, -2, -1], [4, 2, 1], size=(500, 3)).astype(np.float32)
    ours = voxelize(pts, VOXEL, PC_RANGE, 10, 100)
    gen = spconv_utils.Point2VoxelCPU3d(
        vsize_xyz=VOXEL, coors_range_xyz=PC_RANGE, num_point_features=3,
        max_num_points_per_voxel=10, max_num_voxels=100,
    )
    v, c, n = gen.point_to_voxel(tv.from_numpy(pts))
    np.testing.assert_array_equal(ours.coords, c.numpy())
    np.testing.assert_array_equal(ours.num_points, n.numpy())


def test_query_sampling_labels_and_ranges():
    rng_pts = np.random.default_rng(2)
    pts = rng_pts.uniform([0, -2, -1], [4, 2, 1], size=(2000, 3)).astype(np.float32)
    g = voxelize(pts, VOXEL, PC_RANGE, 10, 1000)
    rng = np.random.default_rng(3)
    q, l = sample_train_queries(g.coords, g.grid_size, VOXEL, PC_RANGE, 100, 300, rng)
    assert q.shape == (400, 3) and l.shape == (400,)
    assert l[:100].all() and not l[100:].any()
    # all queries inside the pc range
    assert np.all(q >= np.array(PC_RANGE[:3]) - 1e-5)
    assert np.all(q <= np.array(PC_RANGE[3:]) + 1e-5)
    # positives land in occupied voxels
    vidx = np.floor((q[:100] - np.array(PC_RANGE[:3])) / np.array(VOXEL)).astype(int)
    occ = {tuple(c[::-1]) for c in g.coords}
    hits = sum(tuple(v) in occ for v in vidx)
    assert hits == 100
    # negatives land in empty voxels
    vidx = np.floor((q[100:] - np.array(PC_RANGE[:3])) / np.array(VOXEL)).astype(int)
    miss = sum(tuple(v) in occ for v in vidx)
    assert miss == 0


def test_empty_voxel_centers_are_empty():
    coords_xyz = np.array([[0, 0, 0], [1, 1, 1]])
    rng = np.random.default_rng(4)
    centers = empty_voxel_centers(coords_xyz, (8, 8, 4), 50, VOXEL, PC_RANGE, rng)
    vidx = np.floor((centers - np.array(PC_RANGE[:3])) / np.array(VOXEL)).astype(int)
    for v in vidx:
        assert tuple(v) not in {(0, 0, 0), (1, 1, 1)}


def test_aug_query_helper():
    rng = np.random.default_rng(5)
    pts = rng.uniform([0, -2, -1], [4, 2, 1], size=(10, 3)).astype(np.float32)
    out = aug_query_helper(pts, 100, PC_RANGE, VOXEL, 2, rng)
    assert out.shape == (100, 3)
    np.testing.assert_array_equal(out[:10], pts)
    assert np.all(out >= np.array(PC_RANGE[:3]) - 1e-6)
    assert np.all(out <= np.array(PC_RANGE[3:]) + 1e-6)
    # truncation path
    out2 = aug_query_helper(pts, 4, PC_RANGE, VOXEL, 2, rng)
    np.testing.assert_array_equal(out2, pts[:4])


def test_process_radar_cube_matches_torch_upsample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    cube = rng.random((16, 8, 2, 3)).astype(np.float32) * 60
    cube[..., 2] = (cube[..., 2] > 30).astype(np.float32)
    out = process_radar_cube(cube, max_intensity=45, max_dopp=2.5, upsample=True, tgt_a=32, tgt_e=8)
    assert out.shape == (16, 32, 8, 2)

    pre = process_radar_cube(cube, max_intensity=45, max_dopp=2.5, upsample=False)
    for ch in range(2):
        want = (
            F.interpolate(torch.from_numpy(pre[..., ch]).unsqueeze(0), size=(32, 8),
                          mode="bilinear", align_corners=True)
            .squeeze(0).numpy()
        )
        np.testing.assert_allclose(out[..., ch], want, rtol=1e-4, atol=1e-5)


def test_sharded_sampler():
    s0 = ShardedSampler(10, num_replicas=3, rank=0, shuffle=True, seed=7)
    s1 = ShardedSampler(10, num_replicas=3, rank=1, shuffle=True, seed=7)
    s2 = ShardedSampler(10, num_replicas=3, rank=2, shuffle=True, seed=7)
    all_idx = list(s0) + list(s1) + list(s2)
    assert len(s0) == len(s1) == len(s2) == 4
    assert len(all_idx) == 12  # padded
    assert set(all_idx) == set(range(10))
    # epoch changes the permutation
    s0.set_epoch(1)
    assert list(s0) != list(ShardedSampler(10, 3, 0, True, 7))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_coloradar(root, frames_per_seq=3, points_per_frame=12000)


def test_synthetic_dataset_train_item(synth_root):
    cfg = synthetic_dataset_config(synth_root)
    ds = get_dataset(cfg, "train")
    assert isinstance(ds, ColoRadarDataset)
    assert len(ds) == 6
    item = ds[0]
    assert item["lidar_points"].shape == (10000, 3)
    assert item["query_points"].shape == (10000, 3)
    assert item["query_labels"].shape == (10000,)
    assert int(item["in_voxel_num"]) == 625
    assert item["radar_cube"].shape == (128, 64, 32, 2)
    assert np.abs(item["lidar_points"]).max() <= 1.0 + 1e-5
    # reproducible per (epoch, index)
    item2 = ds[0]
    np.testing.assert_array_equal(item["query_points"], item2["query_points"])
    ds.set_epoch(1)
    item3 = ds[0]
    assert not np.array_equal(item["query_points"], item3["query_points"])


def test_dataloader_batches(synth_root):
    cfg = synthetic_dataset_config(synth_root)
    ds = get_dataset(cfg, "train")
    sampler = ShardedSampler(len(ds), shuffle=True, seed=0)
    dl = DataLoader(ds, batch_size=2, sampler=sampler, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    b = batches[0]
    assert b["lidar_points"].shape == (2, 10000, 3)
    assert b["query_labels"].shape == (2, 10000)
    assert b["radar_cube"].shape == (2, 128, 64, 32, 2)
    assert isinstance(b["lidar_path"], list) and len(b["lidar_path"]) == 2


class TestHUSTRadar:
    def test_hust_layout_and_item(self, tmp_path):
        """HUST tree: lidar_sc/*.bin + flat rae_map/<n>.npy (numeric sort)."""
        import json

        from rald_tpu.config import Config
        from rald_tpu.data.registry import get_dataset
        from rald_tpu import geometry as geo

        rng = np.random.default_rng(0)
        seq = "classroom_f404_20241219_0"
        (tmp_path / seq / "lidar_sc").mkdir(parents=True)
        (tmp_path / seq / "rae_map").mkdir()
        n_frames = 12  # enough that numeric sort != lexical sort (2 < 10)
        for i in range(n_frames):
            pts = rng.uniform([1, -5, -2], [12, 5, 2], (3000, 3)).astype(np.float32)
            pts.tofile(tmp_path / seq / "lidar_sc" / f"{i:04d}.bin")
            cube = rng.normal(size=(32, 8, 2, 3)).astype(np.float32)
            np.save(tmp_path / seq / "rae_map" / f"{i}.npy", cube)
        (tmp_path / "split.json").write_text(json.dumps({"train": [seq], "val": [], "test": []}))

        cfg = Config(
            dataset_name="HUSTRadarDataset",
            root_dir=str(tmp_path),
            split_file="split.json",
            lidar={
                "pc_range": [0, -90, -20, 15.8, 90, 20], "num_point_features": 3,
                "voxel_size": [0.05, 0.25, 0.5], "max_points_per_voxel": 10,
                "max_number_of_voxels": 50000, "sampling": True, "num_samples": 256,
                "query_ratio": 0.0625, "norm_isotropy": False, "norm_anisotropy": True,
                "cache_voxel": False, "view_cone_mode": True,
            },
            radar={
                "input_r_dim": 32, "input_a_dim": 8, "input_e_dim": 2, "input_ch": 3,
                "upsample": False, "norm_intensity": True, "max_intensity": 45,
                "norm_dopp": True, "max_dopp": 2.4958,
            },
        )
        ds = get_dataset(cfg, "train")
        assert len(ds) == n_frames
        # numeric sort: frame index 10 must map to rae_map/10.npy, not 2.npy
        assert ds.radar_path_list[10].stem == "10"
        item = ds[0]
        assert item["radar_cube"].shape == (32, 8, 2, 2)
        assert item["lidar_points"].shape == (256, 3)


def test_voxelize_hand_golden():
    """Hand-derived golden from spconv Point2VoxelCPU3d's documented contract
    (first-appearance voxel order, first-come point capping, (z,y,x) coords)
    — an oracle independent of our implementation, covering the semantics the
    spconv differential test (skipped here: spconv not installed) would."""
    voxel = [1.0, 1.0, 1.0]
    pc_range = [0, 0, 0, 4, 4, 4]
    pts = np.array(
        [
            [0.5, 0.5, 0.5],   # voxel A (0,0,0) -> first seen
            [2.5, 1.5, 0.5],   # voxel B (2,1,0) -> second
            [0.6, 0.4, 0.9],   # voxel A again
            [0.1, 0.1, 0.1],   # voxel A: 3rd point -> dropped (cap 2)
            [-1.0, 0.5, 0.5],  # out of range -> dropped
            [3.9, 3.9, 3.9],   # voxel C (3,3,3) -> third; dropped (max_voxels 2)
            [2.6, 1.6, 0.6],   # voxel B again
        ],
        dtype=np.float32,
    )
    g = voxelize(pts, voxel, pc_range, max_points_per_voxel=2, max_voxels=2)
    # coords are (z, y, x), in first-appearance order
    np.testing.assert_array_equal(g.coords, [[0, 0, 0], [0, 1, 2]])
    np.testing.assert_array_equal(g.num_points, [2, 2])
    np.testing.assert_allclose(g.voxels[0, 0], pts[0])
    np.testing.assert_allclose(g.voxels[0, 1], pts[2])  # first-come keeps 0,2 not 3
    np.testing.assert_allclose(g.voxels[1, 0], pts[1])
    np.testing.assert_allclose(g.voxels[1, 1], pts[6])
