"""TDM-MIMO virtual antenna array synthesis + velocity compensation.

TPU re-design of reference ``dataset_preprocessor/utils/radardsp.py``:
``virtual_array`` (:54-111), ``velocity_compensation`` (:526-545),
``steering_matrix`` (:29-52).

The reference scatters (tx, rx) pairs into the virtual (el, az) grid with a
Python double loop. Here the TX/RX layout is static, so the scatter indices
are precomputed once on the host and the scatter itself is a single
``.at[...].add`` — fully jittable and vmap-able over frames.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def virtual_array_shape(txl: np.ndarray, rxl: np.ndarray) -> tuple[int, int]:
    """(n_elevation, n_azimuth) of the virtual array (reference: radardsp.py:82-97)."""
    ne = int(np.max(txl[:, 2]) + np.max(rxl[:, 2]) + 1)
    na = int(np.max(txl[:, 1]) + np.max(rxl[:, 1]) + 1)
    return ne, na


def _scatter_indices(txl: np.ndarray, rxl: np.ndarray):
    """Host-side precomputation of per-(tx,rx)-pair gather/scatter indices."""
    tx_idx, rx_idx, el_idx, az_idx = [], [], [], []
    for tidx, taz, tel in txl:
        for ridx, raz, rel in rxl:
            tx_idx.append(tidx)
            rx_idx.append(ridx)
            el_idx.append(tel + rel)
            az_idx.append(taz + raz)
    return (
        np.asarray(tx_idx),
        np.asarray(rx_idx),
        np.asarray(el_idx),
        np.asarray(az_idx),
    )


def virtual_array(adc_samples: jnp.ndarray, txl: np.ndarray, rxl: np.ndarray) -> jnp.ndarray:
    """Map (ntx, nrx, nc, ns) samples into the (nel, naz, nc, ns) virtual array.

    Colliding (az, el) positions accumulate, matching the reference's
    "+=" semantics (radardsp.py:105-111). Expressed as a precomputed 0/1
    assignment matmul rather than a scatter: complex scatter-add is
    unsupported on the TPU backend, and for a static layout a (positions x
    pairs) matmul is both portable and fusible.
    """
    txl = np.asarray(txl)
    rxl = np.asarray(rxl)
    ne, na = virtual_array_shape(txl, rxl)
    tx_idx, rx_idx, el_idx, az_idx = _scatter_indices(txl, rxl)
    npairs = len(tx_idx)
    assign = np.zeros((ne * na, npairs), dtype=np.float32)
    assign[el_idx * na + az_idx, np.arange(npairs)] = 1.0

    _, _, nc, ns = adc_samples.shape
    pairs = adc_samples[tuple(tx_idx), tuple(rx_idx)].reshape(npairs, nc * ns)
    va = jnp.asarray(assign, dtype=adc_samples.dtype) @ pairs
    return va.reshape(ne, na, nc, ns)


def velocity_compensation(ntx: int, nc: int) -> jnp.ndarray:
    """TDM-MIMO velocity-induced phase-shift correction matrix
    (reference: radardsp.py:526-545). Shape (ntx, 1, nc, 1), complex64."""
    tl = np.arange(0, ntx)
    cl = np.arange(-(nc // 2), nc // 2)
    tcl = np.kron(tl, cl) / (ntx * nc)
    vcomp = np.exp(-2j * np.pi * tcl).reshape(ntx, 1, nc, 1)
    return jnp.asarray(vcomp, dtype=jnp.complex64)


def steering_matrix(txl: np.ndarray, rxl: np.ndarray, az: np.ndarray, el: np.ndarray) -> np.ndarray:
    """Virtual-array steering matrix (reference: radardsp.py:29-52)."""
    taz, tel = txl[:, 1], txl[:, 2]
    raz, rel = rxl[:, 1], rxl[:, 2]
    laz = (np.kron(taz, np.ones(len(raz))).reshape(-1, len(raz)) + raz).reshape(-1, 1)
    lel = (np.kron(tel, np.ones(len(rel))).reshape(-1, len(rel)) + rel).reshape(-1, 1)
    return np.exp(1j * np.pi * (laz * (np.cos(az) * np.sin(el)) + lel * np.cos(el)))
