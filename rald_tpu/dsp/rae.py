"""RAE intensity/velocity/validity cube builder — the radar DSP hot path.

Behavioral parity with reference ``dataset_preprocessor/utils/radar_preprocessing.py``
``RAEIVVmap`` (:6-62): Blackman window -> range FFT -> doppler FFT(+shift) ->
TDM velocity compensation -> virtual-array synthesis -> azimuth FFT(+shift) ->
elevation FFT(+shift) -> range crop -> per-cell doppler statistics -> dB map.

TPU re-design: one pure function traced under ``jax.jit`` (XLA FFTs on device),
``vmap``-able over frames — replacing the reference's per-frame NumPy in a
process pool (``radar.py:78-115``). The range crop is a multiplicative mask
(static shapes) instead of in-place slicing.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rald_tpu.dsp.params import RadarParams
from rald_tpu.dsp.bins import get_bins
from rald_tpu.dsp.virtual_array import virtual_array, velocity_compensation

# 30th-percentile noise floor (reference: radar_preprocessing.py:4).
NOISE_THRESHOLD = 0.30


@partial(jax.jit, static_argnames=("params", "txl", "rxl"))
def raeivv_map(
    adc_iq: jnp.ndarray,
    params: RadarParams,
    txl: tuple,
    rxl: tuple,
) -> jnp.ndarray:
    """ADC frame -> (range, azimuth, elevation, 3) float32 cube.

    Args:
        adc_iq: float32 raw ADC I/Q samples, shape (ntx, nrx, nc, ns, 2).
            Complex values are formed *inside* the jit region: the TPU
            runtime supports complex math within a compiled program but not
            complex host<->device transfers, so the kernel boundary is real.
        params: static chirp/FFT configuration.
        txl/rxl: antenna layouts as *hashable* nested tuples (static).

    Returns:
        (R, A, E, 3) cube; channels = (intensity dB, velocity m/s, validity).
    """
    txl = np.asarray(txl)
    rxl = np.asarray(rxl)
    adc = jax.lax.complex(adc_iq[..., 0], adc_iq[..., 1])
    ntx, nrx, nc, ns = adc.shape

    # Window + range FFT (reference: radar_preprocessing.py:22-24).
    x = adc * jnp.asarray(np.blackman(ns), dtype=jnp.float32)
    rfft = jnp.fft.fft(x, n=params.range_fftsize, axis=-1)

    # Doppler FFT + shift + TDM velocity compensation (:26-29).
    dfft = jnp.fft.fftshift(jnp.fft.fft(rfft, n=params.doppler_fftsize, axis=-2), axes=-2)
    dfft = dfft * velocity_compensation(ntx, params.doppler_fftsize)

    # Virtual array synthesis (:31).
    va = virtual_array(dfft, txl, rxl)

    # Azimuth + elevation FFTs with spectral shift (:33-39).
    afft = jnp.fft.fftshift(jnp.fft.fft(va, n=params.azimuth_fftsize, axis=1), axes=1)
    efft = jnp.fft.fftshift(jnp.fft.fft(afft, n=params.elevation_fftsize, axis=0), axes=0)

    # Range crop as a static mask (:42-43).
    nr = efft.shape[-1]
    lo = int(nr * params.crop_low)
    hi = int(nr * params.crop_high)
    ridx = jnp.arange(nr)
    keep = (ridx >= lo) & (ridx < nr - hi)
    efft = efft * keep

    ne, na, nv, nr = efft.shape
    _, vbins, _, _ = get_bins(nv, nr, na, ne, params)
    vbins = jnp.asarray(vbins, dtype=jnp.float32)

    power = jnp.abs(efft) ** 2  # (el, az, doppler, range)

    # Doppler-peak velocity (:48-50).
    max_idx = jnp.argmax(power, axis=2)               # (el, az, range)
    max_velocity = vbins[max_idx]

    # Peak-validity mask: top1 * (1 - thr) > top2 along doppler (:51-53).
    top2 = jax.lax.top_k(jnp.moveaxis(power, 2, -1), 2)[0]  # (el, az, range, 2)
    valid = top2[..., 0] * (1.0 - NOISE_THRESHOLD) > top2[..., 1]

    # Doppler-summed power normalized by the 30th-pct noise floor (:54-58).
    psum = jnp.sum(power, axis=2)                     # (el, az, range)
    noise = jnp.quantile(psum, NOISE_THRESHOLD)
    psum = psum / (noise + 1e-6)
    dpcl = 10.0 * jnp.log10(psum + 1.0)

    # (el, az, range) -> (range, az, el), stack channels (:59-61).
    out = jnp.stack(
        [
            jnp.transpose(dpcl, (2, 1, 0)),
            jnp.transpose(max_velocity, (2, 1, 0)),
            jnp.transpose(valid, (2, 1, 0)).astype(jnp.float32),
        ],
        axis=-1,
    )
    return out.astype(jnp.float32)


def raeivv_map_batch(adc_batch: jnp.ndarray, params: RadarParams, txl, rxl) -> jnp.ndarray:
    """Batched frames -> batched cubes (vmap over the frame axis)."""
    fn = partial(raeivv_map, params=params, txl=txl, rxl=rxl)
    return jax.vmap(fn)(adc_batch)


def load_adc_frame(path, params: RadarParams) -> np.ndarray:
    """int16 interleaved IQ file -> float32 (ntx, nrx, nc, ns, 2) with DC removal
    (reference: radar.py:64-76). The DC offset is subtracted per I/Q channel,
    equivalent to subtracting the complex mean."""
    raw = np.fromfile(path, dtype=np.int16)
    raw = raw.reshape(params.num_tx, params.num_rx, params.num_chirps, params.num_adc_samples, 2)
    iq = raw.astype(np.float32)
    iq -= iq.mean(axis=(0, 1, 2, 3), keepdims=True)
    return iq


def complex_to_iq(adc: np.ndarray) -> np.ndarray:
    """Pack a complex ADC frame into the real (…, 2) kernel-boundary layout."""
    return np.stack([adc.real, adc.imag], axis=-1).astype(np.float32)


def as_static_layout(arr: np.ndarray) -> tuple:
    """Antenna layout array -> hashable nested tuple for jit static args."""
    return tuple(tuple(int(v) for v in row) for row in np.asarray(arr))
