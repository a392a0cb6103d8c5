"""CFAR detectors, fully vectorized for TPU.

Behavioral parity with reference ``dataset_preprocessor/utils/radardsp.py``:
``os_cfar`` (:307-338), ``nq_cfar_2d`` (:363-443), ``mask_real_2d`` (:447-523).

The reference iterates every cell in Python and calls
``np.quantile(..., method="weibull")`` on a ragged training-cell list. Here
every cell's training window is materialized as a fixed (2*ws+1)^2 gather with
a validity mask that reproduces the reference's region logic *exactly*
(including its edge-condition quirks, e.g. ``yas < nx - 1`` comparing the
y-axis against nx — see radardsp.py:430 and :497), and the weibull-interpolated
quantile is computed by sort + gather on the masked window. Everything is one
jit region; no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rald_tpu.dsp.params import RadarParams
from rald_tpu.dsp.bins import get_bins


def weibull_quantile(values: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.quantile(values, q, method='weibull') over the last axis."""
    mask = jnp.ones(values.shape, dtype=bool)
    return masked_weibull_quantile(values, mask, q)


def masked_weibull_quantile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Weibull-interpolated (Hyndman-Fan type 6) quantile of masked entries.

    ``values``/``mask`` share shape (..., W); reduces the last axis. Entries
    where ``mask`` is False are excluded. Windows with zero valid entries
    yield +inf (so no detection fires).
    """
    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    vals = jnp.where(mask, values, big)
    vals = jnp.sort(vals, axis=-1)
    n = jnp.sum(mask, axis=-1)  # (...,)

    # 1-based virtual index h = q*(n+1); clamp to [1, n].
    h = q * (n + 1.0)
    lo = jnp.clip(jnp.floor(h).astype(jnp.int32) - 1, 0, jnp.maximum(n - 1, 0))
    hi = jnp.clip(jnp.ceil(h).astype(jnp.int32) - 1, 0, jnp.maximum(n - 1, 0))
    frac = jnp.clip(h - jnp.floor(h), 0.0, 1.0)
    # When h <= 1 the quantile is the minimum; when h >= n it is the maximum —
    # both covered by the clipped lo/hi with interpolation collapsing.
    frac = jnp.where(h < 1.0, 0.0, jnp.where(h >= n, 0.0, frac))

    v_lo = jnp.take_along_axis(vals, lo[..., None], axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(vals, hi[..., None], axis=-1)[..., 0]
    out = v_lo + frac * (v_hi - v_lo)
    return jnp.where(n > 0, out, big)


@partial(jax.jit, static_argnames=("ws", "ngc", "tos", "order_statistic_fraction"))
def os_cfar(
    samples: jnp.ndarray,
    ws: int,
    ngc: int = 2,
    tos: int = 8,
    order_statistic_fraction: float = 0.75,
) -> jnp.ndarray:
    """1-D Ordered-Statistic CFAR (reference: radardsp.py:307-338).

    The reference zero-pads by ws on both sides, so edge windows contain
    literal zeros as training cells — reproduced here.
    """
    ns = samples.shape[-1]
    k = int(ws * order_statistic_fraction)
    padded = jnp.concatenate(
        [jnp.zeros(ws, samples.dtype), samples, jnp.zeros(ws, samples.dtype)]
    )
    pre = np.arange(-ngc - ws // 2, -ngc)
    post = np.arange(ngc + 1, ngc + ws // 2 + 1)
    offs = np.concatenate([pre, post])
    idx = np.arange(ns)[:, None] + ws + offs[None, :]
    tcells = padded[jnp.asarray(idx)]
    tsorted = jnp.sort(tcells, axis=-1)
    return (samples > tsorted[:, k] * tos).astype(jnp.float32)


def _window_offsets(ws: int):
    d = np.arange(-ws, ws + 1)
    dx = np.repeat(d, 2 * ws + 1)
    dy = np.tile(d, 2 * ws + 1)
    return dx, dy  # each (W,) with W = (2ws+1)^2


def _gather_window(plane2d: jnp.ndarray, xs, ys, dx, dy):
    """Gather (P, W) window values from a 2D plane with clipped indices."""
    nx, ny = plane2d.shape
    u = jnp.clip(xs[:, None] + dx[None, :], 0, nx - 1)
    v = jnp.clip(ys[:, None] + dy[None, :], 0, ny - 1)
    inb = (
        (xs[:, None] + dx[None, :] >= 0)
        & (xs[:, None] + dx[None, :] < nx)
        & (ys[:, None] + dy[None, :] >= 0)
        & (ys[:, None] + dy[None, :] < ny)
    )
    return plane2d[u, v], inb


@partial(jax.jit, static_argnames=("ws", "ngc", "quantile", "tos"))
def nq_cfar_2d(
    samples: jnp.ndarray,
    ws: int,
    ngc: int,
    quantile: float = 0.75,
    tos: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-D n'th-quantile CFAR (reference: radardsp.py:363-443).

    Returns ``(mask, snr)`` maps of the input shape; ``snr`` is
    ``samples / noise_estimate`` wherever the mask fires, else 0 — the
    array-form of the reference's ObjectDetected list (:438-442).
    """
    nx, ny = samples.shape
    dx, dy = _window_offsets(ws)
    dxj, dyj = jnp.asarray(dx), jnp.asarray(dy)

    xs = jnp.repeat(jnp.arange(nx), ny)
    ys = jnp.tile(jnp.arange(ny), nx)

    vals, inb = _gather_window(samples, xs, ys, dxj, dyj)  # (P, W)

    x = xs[:, None]
    y = ys[:, None]
    dxb = dxj[None, :]
    dyb = dyj[None, :]

    # Region masks mirror the reference slice arithmetic (radardsp.py:383-434),
    # including the y-vs-nx comparison on region 4 (:430).
    r1 = (x > ngc) & (dxb <= -ngc - 1)
    r2 = (x + ngc + 1 < nx - 1) & (dxb >= ngc + 1)
    r3 = (y > ngc) & (dxb >= -ngc) & (dxb <= ngc) & (dyb <= -ngc - 1)
    r4 = (y + ngc + 1 < nx - 1) & (dxb >= -ngc) & (dxb <= ngc) & (dyb >= ngc + 1)
    tmask = (r1 | r2 | r3 | r4) & inb

    m = masked_weibull_quantile(vals, tmask, quantile).reshape(nx, ny)
    mask = (samples > m * tos).astype(jnp.float32)
    snr = jnp.where(mask > 0, samples / m, 0.0)
    return mask, snr


@partial(jax.jit, static_argnames=("params", "ws", "ngc", "quantile", "tos"))
def mask_real_2d(
    cfar_power: jnp.ndarray,
    params: RadarParams,
    ws: int,
    ngc: int,
    quantile: float = 0.75,
    tos: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(el, az, range) doppler-peak CFAR (reference: radardsp.py:447-523).

    ``cfar_power`` has shape (ne, na, nv, nr). For each (e, a, r) the cell
    under test is the doppler peak; the training window lives in the
    (doppler, range) plane. Returns ``(mask, doppler_real)`` of shape
    (ne, na, nr) where ``doppler_real`` holds the peak velocity bin where the
    mask fires (:516-522).
    """
    ne, na, nv, nr = cfar_power.shape
    _, vbins, _, _ = get_bins(nr, nv, na, ne, params)
    vbins = jnp.asarray(vbins, dtype=cfar_power.dtype)

    v_peak = jnp.argmax(cfar_power, axis=2)  # (ne, na, nr)

    dx, dy = _window_offsets(ws)
    dxj, dyj = jnp.asarray(dx), jnp.asarray(dy)

    def per_plane(plane, vpk):  # plane (nv, nr), vpk (nr,)
        rs = jnp.arange(nr)
        vals, inb = _gather_window(plane, vpk, rs, dxj, dyj)  # (nr, W)
        v = vpk[:, None]
        r = rs[:, None]
        dvb = dxj[None, :]
        drb = dyj[None, :]
        # Regions (reference: radardsp.py:458-515); all bounds clamped there,
        # and conditions compare the *clamped* vas/ras (:497, :511).
        r1 = (v > ngc) & (dvb <= -ngc - 1)
        r2 = (jnp.minimum(v + ngc + 1, nv) < nv - 1) & (dvb >= ngc + 1)
        r3 = (r > ngc) & (dvb >= -ngc) & (dvb <= ngc) & (drb <= -ngc - 1)
        r4 = (
            (jnp.minimum(r + ngc + 1, nr) < nr - 1)
            & (dvb >= -ngc)
            & (dvb <= ngc)
            & (drb >= ngc + 1)
        )
        tmask = (r1 | r2 | r3 | r4) & inb
        m = masked_weibull_quantile(vals, tmask, quantile)  # (nr,)
        cut = plane[vpk, rs]
        fire = cut > m * tos
        return fire.astype(jnp.float32), jnp.where(fire, vbins[vpk], 0.0)

    planes = cfar_power.reshape(ne * na, nv, nr)
    vpeaks = v_peak.reshape(ne * na, nr)
    mask, dreal = jax.vmap(per_plane)(planes, vpeaks)
    return mask.reshape(ne, na, nr), dreal.reshape(ne, na, nr)
