import numpy as np
import pytest

import jax.numpy as jnp

from rald_tpu.dsp import (
    RadarParams,
    budgeted_topk,
    cfar_points_from_cube,
    cube_idx2coord,
    get_bins,
    mask_real_2d,
    masked_weibull_quantile,
    nq_cfar_2d,
    os_cfar,
    rae_interpo,
    raeivv_map,
    resize_linear_align_corners,
    velocity_compensation,
    virtual_array,
    weibull_quantile,
    weighted_allocation,
)
from rald_tpu.dsp.rae import as_static_layout

from oracles import (
    budgeted_topk_oracle,
    mask_real_2d_oracle,
    nq_cfar_2d_oracle,
    os_cfar_oracle,
    raeivv_oracle,
    virtual_array_oracle,
    weighted_allocation_oracle,
)

# ColoRadar single-chip AWR1843 layout (dataset_preprocessor/config/antenna_array.txt).
TXL = np.array([[0, 0, 0], [2, 2, 1], [1, 4, 0]])
RXL = np.array([[0, 0, 0], [1, 1, 0], [2, 2, 0], [3, 3, 0]])


def small_params(**kw):
    defaults = dict(
        num_tx=3, num_rx=4, num_chirps=16, num_adc_samples=32,
        range_fftsize=32, doppler_fftsize=16, azimuth_fftsize=8, elevation_fftsize=2,
    )
    defaults.update(kw)
    return RadarParams(**defaults)


def test_weibull_quantile_matches_numpy():
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 17, 64]:
        vals = rng.normal(size=(4, n)).astype(np.float32)
        for q in [0.3, 0.5, 0.75, 0.9]:
            got = np.asarray(weibull_quantile(jnp.asarray(vals), q))
            want = np.quantile(vals, q, method="weibull", axis=-1)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_masked_weibull_quantile():
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(8, 20)).astype(np.float32)
    mask = rng.random((8, 20)) > 0.4
    mask[0] = False  # empty window -> +inf
    got = np.asarray(masked_weibull_quantile(jnp.asarray(vals), jnp.asarray(mask), 0.75))
    assert got[0] == np.inf
    for i in range(1, 8):
        if mask[i].sum():
            want = np.quantile(vals[i][mask[i]], 0.75, method="weibull")
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_os_cfar_matches_oracle():
    rng = np.random.default_rng(2)
    s = rng.exponential(size=100).astype(np.float32)
    s[20] = 100.0
    s[70] = 80.0
    got = np.asarray(os_cfar(jnp.asarray(s), ws=16, ngc=2, tos=6))
    want = os_cfar_oracle(s, ws=16, ngc=2, tos=6)
    np.testing.assert_array_equal(got, want)
    assert got[20] == 1


def test_nq_cfar_2d_matches_oracle():
    rng = np.random.default_rng(3)
    s = rng.exponential(size=(24, 20)).astype(np.float64)
    s[5, 5] = 500.0
    s[15, 12] = 300.0
    got_mask, got_snr = nq_cfar_2d(jnp.asarray(s), ws=4, ngc=1, quantile=0.75, tos=8)
    want_mask, want_snr = nq_cfar_2d_oracle(s, ws=4, ngc=1, q=0.75, tos=8)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)
    np.testing.assert_allclose(np.asarray(got_snr), want_snr, rtol=1e-4)
    assert want_mask[5, 5] == 1


def test_mask_real_2d_matches_oracle():
    rng = np.random.default_rng(4)
    p = rng.exponential(size=(2, 3, 12, 16)).astype(np.float64)
    p[0, 1, 4, 8] = 400.0
    params = small_params(doppler_fftsize=12, range_fftsize=16, azimuth_fftsize=3, elevation_fftsize=2)
    _, vbins, _, _ = get_bins(16, 12, 3, 2, params)
    got_mask, got_dop = mask_real_2d(jnp.asarray(p), params, ws=3, ngc=1, quantile=0.75, tos=2)
    want_mask, want_dop = mask_real_2d_oracle(p, vbins, ws=3, ngc=1, q=0.75, tos=2)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)
    np.testing.assert_allclose(np.asarray(got_dop), want_dop, rtol=1e-4, atol=1e-6)


def test_virtual_array_matches_oracle():
    rng = np.random.default_rng(5)
    adc = (rng.normal(size=(3, 4, 6, 8)) + 1j * rng.normal(size=(3, 4, 6, 8))).astype(np.complex64)
    got = np.asarray(virtual_array(jnp.asarray(adc), TXL, RXL))
    want = virtual_array_oracle(adc, TXL, RXL)
    assert got.shape == (2, 8, 6, 8)
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-5, atol=1e-5)


def test_velocity_compensation_values():
    ntx, nc = 3, 8
    v = np.asarray(velocity_compensation(ntx, nc))
    assert v.shape == (ntx, 1, nc, 1)
    tl = np.arange(ntx)
    cl = np.arange(-nc // 2, nc // 2)
    want = np.exp(-2j * np.pi * np.kron(tl, cl) / (ntx * nc)).reshape(ntx, 1, nc, 1)
    np.testing.assert_allclose(v, want, atol=1e-6)


def test_raeivv_map_matches_oracle():
    rng = np.random.default_rng(6)
    params = small_params()
    adc = (rng.normal(size=(3, 4, 16, 32)) + 1j * rng.normal(size=(3, 4, 16, 32))).astype(np.complex64)
    iq = np.stack([adc.real, adc.imag], axis=-1)
    got = np.asarray(raeivv_map(jnp.asarray(iq), params, as_static_layout(TXL), as_static_layout(RXL)))
    # Reference quirk: RAEIVVmap calls _get_bins(nv, nr, na, ne) — doppler size
    # in the "ns" slot and range size in the "nc" slot (radar_preprocessing.py:45).
    _, vbins, _, _ = get_bins(params.doppler_fftsize, params.range_fftsize,
                              params.azimuth_fftsize, params.elevation_fftsize, params)
    want = raeivv_oracle(adc.astype(np.complex128), params, TXL, RXL, vbins)
    assert got.shape == (32, 8, 2, 3)
    np.testing.assert_allclose(got[..., 0], want[..., 0], rtol=1e-3, atol=1e-3)  # intensity dB
    np.testing.assert_allclose(got[..., 1], want[..., 1], rtol=1e-3, atol=1e-4)  # velocity
    # validity can flip on near-ties in float32 vs float64; demand 99% agreement
    assert (got[..., 2] == want[..., 2]).mean() > 0.99


def test_weighted_allocation_matches_oracle():
    rng = np.random.default_rng(7)
    w = rng.random(16).astype(np.float32)
    got = np.asarray(weighted_allocation(jnp.asarray(w), 1000))
    want = weighted_allocation_oracle(w, 1000)
    assert got.sum() == 1000
    np.testing.assert_array_equal(got, want)
    # all-zero weights
    z = np.zeros(7, np.float32)
    got = np.asarray(weighted_allocation(jnp.asarray(z), 10))
    np.testing.assert_array_equal(got, weighted_allocation_oracle(z, 10))


def test_budgeted_topk_matches_oracle():
    rng = np.random.default_rng(8)
    cube = rng.random((6, 8, 4)).astype(np.float32)
    w = cube.sum(axis=(1, 2)) / cube.sum()
    budgets = weighted_allocation_oracle(w, 50)
    got_peaks, got_vals = budgeted_topk(jnp.asarray(cube), jnp.asarray(budgets), 50)
    want_peaks, want_vals = budgeted_topk_oracle(cube, budgets)
    np.testing.assert_allclose(np.asarray(got_vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_peaks), want_peaks)


def test_rae_interpo_matches_torch_trilinear():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(9)
    x = rng.random((1, 16, 8, 2)).astype(np.float32)
    got = np.asarray(rae_interpo(jnp.asarray(x), 32, 16, 8))
    want = (
        F.interpolate(torch.from_numpy(x).unsqueeze(1), size=(32, 16, 8),
                      mode="trilinear", align_corners=False)
        .squeeze(1).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_align_corners_matches_torch_bilinear():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(10)
    x = rng.random((128, 8, 2)).astype(np.float32)  # (R, A, E)
    got = np.asarray(resize_linear_align_corners(jnp.asarray(x), (64, 32), (1, 2)))
    want = (
        F.interpolate(torch.from_numpy(x).unsqueeze(0), size=(64, 32),
                      mode="bilinear", align_corners=True)
        .squeeze(0).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cube_idx2coord_endpoints():
    idx = np.array([[0, 0, 0], [9, 15, 7]])
    coords = np.asarray(cube_idx2coord(idx, 10, 16, 8, max_range=15.0, return_in_degrees=True))
    assert coords[0, 0] == pytest.approx(1.5)       # first range cell
    assert coords[0, 1] == pytest.approx(-90.0)     # azimuth axis endpoint (negated)
    assert coords[1, 1] == pytest.approx(90.0)
    assert coords[0, 2] == pytest.approx(-90.0)
    assert coords[1, 2] == pytest.approx(90.0)


def test_cfar_points_pipeline():
    rng = np.random.default_rng(11)
    cube = rng.random((16, 8, 4)).astype(np.float32)
    pts, vals = cfar_points_from_cube(jnp.asarray(cube), 32, 16, 8, 200, 15.0)
    assert pts.shape == (200, 3)
    assert vals.shape == (200,)
    pts = np.asarray(pts)
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 15.0
    assert np.abs(pts[:, 1]).max() <= 90.0


def test_bins_shapes():
    params = small_params()
    rbins, vbins, abins, ebins = get_bins(128, 128, 8, 2, params)
    assert len(rbins) == 128 and len(vbins) == 128 and len(abins) == 8 and len(ebins) == 2
    assert vbins[0] < 0 < vbins[-1]
