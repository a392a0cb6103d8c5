"""On-device query densification (rald_tpu.eval.densify) vs the host
aug_query_helper semantics (reference datasets/utils/query_helper.py:3-43):
originals verbatim, fills = jittered uniform picks clipped to pc_range."""
import jax
import numpy as np
import pytest

from rald_tpu import geometry as geo
from rald_tpu.eval.densify import densify_queries

PC_RANGE = [0, -90, -20, 15.8, 90, 20]
VOXEL = [0.05, 0.25, 0.5]


def _norm(p):
    return geo.norm_points(p, PC_RANGE, True, False).astype(np.float32)


def _unnorm(p):
    return geo.inverse_norm_points(p, PC_RANGE, True, False)


class TestDensifyQueries:
    def test_originals_verbatim_scattered_mask(self):
        rng = np.random.default_rng(0)
        pts = _norm(rng.uniform([0, -90, -20], [15.8, 90, 20], size=(2, 64, 3)))
        mask = rng.uniform(size=(2, 64)) > 0.6  # scattered hits
        k = 128
        out, valid, n = densify_queries(
            pts, mask, k, jax.random.PRNGKey(0), PC_RANGE, VOXEL, 2, True, False
        )
        out, valid, n = np.asarray(out), np.asarray(valid), np.asarray(n)
        for b in range(2):
            originals = pts[b][mask[b]]
            assert n[b] == len(originals)
            np.testing.assert_allclose(out[b, : n[b]], originals, atol=1e-6)
            assert valid[b].all()

    def test_fills_are_jittered_picks_in_bounds(self):
        rng = np.random.default_rng(1)
        pts = _norm(rng.uniform([0, -90, -20], [15.8, 90, 20], size=(1, 16, 3)))
        mask = np.ones((1, 16), bool)
        k, scale = 512, 3
        out, valid, n = densify_queries(
            pts, mask, k, jax.random.PRNGKey(1), PC_RANGE, VOXEL, scale, True, False
        )
        out = np.asarray(out)
        fills_un = _unnorm(out[0, 16:])
        lo, hi = np.asarray(PC_RANGE[:3]), np.asarray(PC_RANGE[3:])
        assert (fills_un >= lo - 1e-5).all() and (fills_un <= hi + 1e-5).all()
        # every fill within max jitter (scale * voxel) of SOME original
        orig_un = _unnorm(pts[0])
        d = np.abs(fills_un[:, None, :] - orig_un[None, :, :])
        max_jit = scale * np.asarray(VOXEL) + 1e-5
        assert (d <= max_jit).all(axis=-1).any(axis=1).all()

    def test_zero_valid_inputs(self):
        pts = np.zeros((2, 8, 3), np.float32)
        mask = np.zeros((2, 8), bool)
        mask[1, 3] = True
        out, valid, n = densify_queries(
            pts, mask, 32, jax.random.PRNGKey(2), PC_RANGE, VOXEL, 2, True, False
        )
        valid, n = np.asarray(valid), np.asarray(n)
        assert n[0] == 0 and not valid[0].any()
        assert n[1] == 1 and valid[1].all()

    def test_more_valid_than_k_takes_first_k(self):
        rng = np.random.default_rng(3)
        pts = _norm(rng.uniform([0, -90, -20], [15.8, 90, 20], size=(1, 64, 3)))
        mask = np.ones((1, 64), bool)
        out, valid, n = densify_queries(
            pts, mask, 16, jax.random.PRNGKey(3), PC_RANGE, VOXEL, 2, True, False
        )
        np.testing.assert_allclose(np.asarray(out)[0], pts[0, :16], atol=1e-6)

    def test_matches_host_aug_distribution_bounds(self):
        """Same construction as data.query.aug_query_helper: first-n
        originals + bounded jitter; parity of the deterministic parts."""
        from rald_tpu.data.query import aug_query_helper

        rng = np.random.default_rng(4)
        raw_un = rng.uniform([0, -90, -20], [15.8, 90, 20], size=(10, 3)).astype(np.float32)
        host = aug_query_helper(raw_un, 64, PC_RANGE, VOXEL, 2, np.random.default_rng(0))
        np.testing.assert_allclose(host[:10], raw_un, atol=1e-6)
        dev, _, _ = densify_queries(
            _norm(raw_un)[None], np.ones((1, 10), bool), 64,
            jax.random.PRNGKey(4), PC_RANGE, VOXEL, 2, True, False,
        )
        dev_un = _unnorm(np.asarray(dev)[0])
        np.testing.assert_allclose(dev_un[:10], raw_un, atol=1e-5)
