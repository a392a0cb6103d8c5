"""Native C++ host ops vs their Python/JAX reference implementations."""
import numpy as np
import pytest

from rald_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build():
        pytest.skip("g++ unavailable — native library not built")
    assert native.available()


class TestNativeVoxelize:
    def test_matches_numpy_voxelizer(self):
        from rald_tpu.data.voxelizer import voxelize as np_voxelize

        rng = np.random.default_rng(0)
        pts = rng.uniform([-1, -16, -6], [16, 16, 6], size=(20000, 3)).astype(np.float32)
        args = ([0.5, 0.5, 0.5], [0, -15, -5, 15, 15, 5], 10, 5000)
        a = native.voxelize(pts, *args)
        b = np_voxelize(pts, *args)
        assert a.voxels.shape == b.voxels.shape
        np.testing.assert_array_equal(a.coords, b.coords)
        np.testing.assert_array_equal(a.num_points, b.num_points)
        np.testing.assert_allclose(a.voxels, b.voxels)

    def test_caps_respected(self):
        pts = np.zeros((100, 3), np.float32) + 0.25  # all in one voxel
        g = native.voxelize(pts, [0.5, 0.5, 0.5], [0, 0, 0, 1, 1, 1], 10, 50)
        assert len(g.coords) == 1
        assert g.num_points[0] == 10

    def test_max_voxels_drop_order(self):
        # 5 distinct voxels in scan order, cap at 3 -> first 3 kept
        pts = np.array([[i + 0.5, 0.5, 0.5] for i in range(5)], np.float32)
        g = native.voxelize(pts, [1, 1, 1], [0, 0, 0, 5, 1, 1], 4, 3)
        assert len(g.coords) == 3
        np.testing.assert_array_equal(g.coords[:, 2], [0, 1, 2])


class TestNativeKNNChamfer:
    def test_nn_dists_matches_scipy(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(1)
        a = rng.normal(size=(500, 3)).astype(np.float32)
        b = rng.normal(size=(700, 3)).astype(np.float32)
        got = native.nn_dists(a, b)
        want, _ = cKDTree(b).query(a)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)

    def test_chamfer_matches_reference_formula(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(2)
        a = rng.normal(size=(300, 3)).astype(np.float32)
        b = rng.normal(size=(400, 3)).astype(np.float32)
        d_ab, _ = cKDTree(b).query(a)
        d_ba, _ = cKDTree(a).query(b)
        want = 0.5 * d_ab.mean() + 0.5 * d_ba.mean()
        assert native.chamfer(a, b) == pytest.approx(want, rel=1e-6)

    def test_chamfer_matches_device_kernel(self):
        from rald_tpu.eval.chamfer import chamfer_distance

        rng = np.random.default_rng(3)
        a = rng.normal(size=(200, 3)).astype(np.float32)
        b = rng.normal(size=(350, 3)).astype(np.float32)
        assert native.chamfer(a, b) == pytest.approx(chamfer_distance(a, b), rel=1e-4)

    def test_empty_pred_is_inf(self):
        assert native.chamfer(np.zeros((0, 3)), np.ones((5, 3))) == float("inf")


class TestNativeFPS:
    def test_matches_jax_fps(self):
        from rald_tpu.ops.fps import farthest_point_sampling

        rng = np.random.default_rng(4)
        pts = rng.normal(size=(256, 3)).astype(np.float32)
        got = native.fps(pts, 32)
        want = np.asarray(farthest_point_sampling(pts, 32))
        np.testing.assert_array_equal(got, want)


class TestFscore:
    """F-score@tau (rald_tpu.eval.chamfer.chamfer_and_fscore) — paper metric,
    computed jointly with Chamfer from the same NN passes."""

    def test_matches_scipy_oracle(self):
        from scipy.spatial import cKDTree

        from rald_tpu.eval.chamfer import chamfer_and_fscore, chamfer_distance

        rng = np.random.default_rng(4)
        pred = rng.normal(size=(300, 3)).astype(np.float32)
        gt = rng.normal(size=(450, 3)).astype(np.float32)
        tau = 0.3
        d_pg, _ = cKDTree(gt).query(pred)
        d_gp, _ = cKDTree(pred).query(gt)
        precision = float((d_pg < tau).mean())
        recall = float((d_gp < tau).mean())
        want_f = 2 * precision * recall / (precision + recall)
        cd, f = chamfer_and_fscore(pred, gt, tau)
        assert f == pytest.approx(want_f, abs=1e-6)
        assert cd == pytest.approx(chamfer_distance(pred, gt), rel=1e-6)

    def test_hand_case(self):
        from rald_tpu.eval.chamfer import chamfer_and_fscore

        pred = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
        gt = np.array([[0, 0, 0.05], [5, 5, 5]], np.float32)
        _, f = chamfer_and_fscore(pred, gt, tau=0.1)
        # one of two pred points within tau, one of two gt points -> P=R=F=0.5
        assert f == pytest.approx(0.5, abs=1e-6)

    def test_empty_pred(self):
        from rald_tpu.eval.chamfer import chamfer_and_fscore

        cd, f = chamfer_and_fscore(np.zeros((0, 3)), np.ones((5, 3)), tau=0.1)
        assert cd == float("inf") and f == 0.0

    def test_perfect_match(self):
        from rald_tpu.eval.chamfer import chamfer_and_fscore

        pts = np.random.default_rng(5).normal(size=(64, 3)).astype(np.float32)
        cd, f = chamfer_and_fscore(pts, pts, tau=0.05)
        assert cd == pytest.approx(0.0, abs=1e-5) and f == pytest.approx(1.0)


class TestBatchedChamfer:
    """One-dispatch-per-eval-batch Chamfer/F-score (VERDICT r4 #1b): the
    batched path must agree with the settled per-frame path on ragged
    clouds, including the empty-prediction edge."""

    def test_matches_per_frame(self):
        from rald_tpu.eval.chamfer import chamfer_and_fscore, chamfer_and_fscore_batch

        rng = np.random.default_rng(6)
        preds = [rng.normal(size=(n, 3)).astype(np.float32) for n in (37, 301, 1, 129)]
        gts = [rng.normal(size=(n, 3)).astype(np.float32) for n in (90, 55, 200, 64)]
        cds, fs = chamfer_and_fscore_batch(preds, gts, tau=0.5)
        for i in range(4):
            cd_i, f_i = chamfer_and_fscore(preds[i], gts[i], tau=0.5)
            assert cds[i] == pytest.approx(cd_i, rel=1e-5)
            assert fs[i] == pytest.approx(f_i, abs=1e-5)

    def test_empty_pred_frame(self):
        from rald_tpu.eval.chamfer import chamfer_and_fscore_batch

        rng = np.random.default_rng(7)
        preds = [np.zeros((0, 3), np.float32), rng.normal(size=(40, 3)).astype(np.float32)]
        gts = [np.ones((5, 3), np.float32), rng.normal(size=(30, 3)).astype(np.float32)]
        cds, fs = chamfer_and_fscore_batch(preds, gts, tau=0.1)
        assert cds[0] == float("inf") and fs[0] == 0.0
        assert np.isfinite(cds[1])


class TestNNMinKernel:
    """Pallas min-distance kernel (interpret mode on CPU) vs numpy brute
    force — the TPU Chamfer inner loop (rald_tpu/ops/nn_dist_kernel.py)."""

    def test_matches_bruteforce(self):
        from rald_tpu.ops.nn_dist_kernel import nn_min_sq_batch

        rng = np.random.default_rng(8)
        a = rng.normal(size=(2, 40, 3)).astype(np.float32) * 5
        b = rng.normal(size=(2, 17, 3)).astype(np.float32) * 5
        got = np.asarray(nn_min_sq_batch(a, b, tile_a=16, tile_b=128, interpret=True))
        d2 = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, d2.min(axis=2), rtol=1e-6, atol=1e-6)

    def test_pad_rows_never_win(self):
        from rald_tpu.ops.nn_dist_kernel import BIG, nn_min_sq_batch

        rng = np.random.default_rng(9)
        a = rng.normal(size=(1, 12, 3)).astype(np.float32)
        b = np.full((1, 20, 3), BIG, np.float32)
        b[0, :3] = rng.normal(size=(3, 3)).astype(np.float32)
        got = np.asarray(nn_min_sq_batch(a, b, tile_a=8, tile_b=128, interpret=True))
        d2 = ((a[:, :, None, :] - b[:, None, :3, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, d2.min(axis=2), rtol=1e-6, atol=1e-6)

    def test_both_directions_matches_two_passes(self):
        """nn_min_sq_both (one distance sweep, row+col min) must be bitwise
        equal to two independent nn_min_sq_batch calls — same blocks, min is
        associative — including under multi-tile grids and BIG-padded rows
        on either side."""
        from rald_tpu.ops.nn_dist_kernel import BIG, nn_min_sq_batch, nn_min_sq_both

        rng = np.random.default_rng(10)
        a = (rng.normal(size=(2, 45, 3)) * 5).astype(np.float32)
        b = (rng.normal(size=(2, 300, 3)) * 5).astype(np.float32)
        a[0, 40:] = BIG  # masked pred rows must not win the col min
        b[1, 290:] = BIG  # masked gt rows must not win the row min
        d_ab, d_ba = nn_min_sq_both(a, b, tile_a=16, tile_b=128, interpret=True)
        want_ab = nn_min_sq_batch(a, b, tile_a=16, tile_b=128, interpret=True)
        want_ba = nn_min_sq_batch(b, a, tile_a=16, tile_b=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(d_ab)[:, :40], np.asarray(want_ab)[:, :40])
        np.testing.assert_array_equal(np.asarray(d_ba)[:, :290], np.asarray(want_ba)[:, :290])


class TestChamferOracleExactness:
    """The Chamfer/F-score backends vs the scipy cKDTree oracle at REALISTIC
    coordinate magnitudes (~15 m). This is the regression that bit round 4:
    on TPU the jnp |a|^2+|b|^2-2ab formulation runs its f32 matmul as bf16
    passes at default precision, and the cancellation noise (~0.3 absolute
    in d2 at 15 m coords) UNDERSTATED CD by ~33% and inflated F-score@0.1
    10x (measured on-chip: scipy cd 0.3076/f 0.0517, old path cd 0.2075/
    f 0.5763, Pallas kernel exact). The batched path must stay exact on
    every backend — its kernel uses subtract-square, no matmul."""

    def test_batched_matches_scipy_at_metric_scale(self):
        from scipy.spatial import cKDTree

        from rald_tpu.eval.chamfer import chamfer_and_fscore_batch

        rng = np.random.default_rng(11)
        pred = rng.uniform([0, -15, -5], [15.8, 15, 5], size=(4000, 3)).astype(np.float32)
        gt = pred[rng.choice(4000, 1500)] + rng.normal(
            scale=0.15, size=(1500, 3)
        ).astype(np.float32)
        tau = 0.1
        d_pg, _ = cKDTree(gt).query(pred)
        d_gp, _ = cKDTree(pred).query(gt)
        want_cd = 0.5 * d_pg.mean() + 0.5 * d_gp.mean()
        p, r = (d_pg < tau).mean(), (d_gp < tau).mean()
        want_f = 2 * p * r / (p + r)
        cds, fs = chamfer_and_fscore_batch([pred], [gt], tau)
        assert cds[0] == pytest.approx(want_cd, rel=1e-4)
        assert fs[0] == pytest.approx(want_f, abs=1e-4)
