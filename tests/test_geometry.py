import numpy as np
import pytest

from rald_tpu import geometry as geo
from rald_tpu.constants import T_RADAR_TO_LIDAR, quaternion_to_matrix

PC_RANGE = [0, -90, -20, 15.8, 90, 20]


def test_norm_inverse_roundtrip_aniso():
    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -90, -20], [15.8, 90, 20], size=(1000, 3)).astype(np.float32)
    normed = geo.norm_points(pts, PC_RANGE, anisotropic=True, isotropic=False)
    assert np.all(normed >= -1) and np.all(normed <= 1)
    back = geo.inverse_norm_points(normed, PC_RANGE, anisotropic=True, isotropic=False)
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-4)


def test_norm_inverse_roundtrip_iso():
    rng = np.random.default_rng(1)
    pts = rng.uniform([0, -90, -20], [15.8, 90, 20], size=(500, 3)).astype(np.float32)
    normed = geo.norm_points(pts, PC_RANGE, anisotropic=False, isotropic=True)
    back = geo.inverse_norm_points(normed, PC_RANGE, anisotropic=False, isotropic=True)
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-4)


def test_polar_cartesian_roundtrip():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2000, 3)).astype(np.float64)
    pts[:, 0] += 5.0  # keep away from origin
    polar = geo.cartesian2polar(pts)
    back = geo.polar2cartesian(polar)
    np.testing.assert_allclose(back, pts, rtol=1e-6, atol=1e-6)


def test_polar_conventions():
    # +y should map to negative azimuth (reference negates atan2).
    p = np.array([[0.0, 1.0, 0.0]])
    polar = geo.cartesian2polar(p)
    assert polar[0, 1] == pytest.approx(-90.0)
    # +z is +elevation.
    p = np.array([[1.0, 0.0, 1.0]])
    polar = geo.cartesian2polar(p)
    assert polar[0, 2] == pytest.approx(45.0)


def test_fov_mask_and_filter():
    pts = np.array([[0.5, 0.5, 0.5], [1.5, 0, 0], [-1.0, 0, 0], [0.99, -0.99, 0]])
    mask = geo.fov_mask(pts)
    assert list(mask) == [True, False, False, True]
    filtered = geo.remove_points_outside_fov(pts)
    assert filtered.shape == (2, 3)


def test_polar_range_filter():
    pts = np.array([[1.0, 0.0, 0.0], [20.0, 0.0, 0.0], [5.0, 95.0, 0.0], [5.0, 10.0, -10.0]])
    limits = [[0, 15.8], [-90, 90], [-20, 20]]
    out = geo.filter_points_polar(pts, limits)
    assert out.shape == (2, 3)


def test_transform_and_inverse():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3))
    out = geo.transform_points(pts, T_RADAR_TO_LIDAR)
    back = geo.transform_points(out, geo.get_inverse_tf(T_RADAR_TO_LIDAR))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_quaternion_matches_scipy():
    scipy = pytest.importorskip("scipy.spatial.transform")
    q = [0.1, -0.3, 0.7, 0.64]
    expected = scipy.Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(quaternion_to_matrix(q), expected, atol=1e-12)


def test_remove_empty_points():
    pts = np.array([[0, 0, 0], [1, 2, 3], [0, 0, 0]], dtype=np.float32)
    assert geo.remove_empty_points(pts).shape == (1, 3)
