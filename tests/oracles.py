"""Loop-based NumPy oracles replicating the reference semantics.

These are deliberately written as straight per-cell loops (the slowest,
most-obviously-correct formulation) and serve as the golden behavior for the
vectorized TPU implementations. Semantics follow the reference modules cited
in each docstring, including their edge-condition quirks.
"""
import numpy as np


def os_cfar_oracle(samples, ws, ngc=2, tos=8, frac=0.75):
    """1-D OS-CFAR (reference: radardsp.py:307-338)."""
    ns = len(samples)
    k = int(ws * frac)
    padded = np.concatenate([np.zeros(ws), samples, np.zeros(ws)])
    mask = np.zeros(ns)
    for i in range(ns):
        c = ws + i
        t = np.concatenate([padded[c - ngc - ws // 2 : c - ngc], padded[c + ngc + 1 : c + ngc + ws // 2 + 1]])
        t = np.sort(t)
        if padded[c] > t[k] * tos:
            mask[i] = 1
    return mask


def nq_cfar_2d_oracle(s, ws, ngc, q=0.75, tos=8):
    """2-D quantile CFAR (reference: radardsp.py:363-443, incl. the
    y-axis-vs-nx comparison quirk on the 4th region at :430)."""
    nx, ny = s.shape
    mask = np.zeros((nx, ny))
    snr = np.zeros((nx, ny))
    for x in range(nx):
        xbs, xbe = max(x - ws, 0), max(x - ngc, 0)
        xas, xae = x + ngc + 1, min(x + ws + 1, nx)
        for y in range(ny):
            ybs, ybe = max(y - ws, 0), y - ngc
            yas, yae = y + ngc + 1, min(y + ws + 1, ny)
            cells = []
            if xbe > 0:
                cells.append(s[xbs:xbe, ybs:yae].ravel())
            if xas < nx - 1:
                cells.append(s[xas:xae, ybs:yae].ravel())
            if ybe > 0:
                cells.append(s[xbe:xas, ybs:ybe].ravel())
            if yas < nx - 1:  # reference quirk: nx, not ny
                cells.append(s[xbe:xas, yas:yae].ravel())
            t = np.concatenate(cells) if cells else np.array([])
            if t.size:
                m = np.quantile(t, q, method="weibull")
                if s[x, y] > m * tos:
                    mask[x, y] = 1
                    snr[x, y] = s[x, y] / m
    return mask, snr


def mask_real_2d_oracle(p, vbins, ws, ngc, q=0.75, tos=2):
    """Doppler-peak CFAR over (v, r) planes (reference: radardsp.py:447-523)."""
    ne, na, nv, nr = p.shape
    mask = np.zeros((ne, na, nr))
    dop = np.zeros((ne, na, nr))
    vpk = np.argmax(p, axis=2)
    for e in range(ne):
        for a in range(na):
            for r in range(nr):
                v = vpk[e, a, r]
                vbs, vbe = max(v - ws, 0), max(v - ngc, 0)
                vas, vae = min(v + ngc + 1, nv), min(v + ws + 1, nv)
                rbs, rbe = max(r - ws, 0), max(r - ngc, 0)
                ras, rae = min(r + ngc + 1, nr), min(r + ws + 1, nr)
                cells = []
                if vbe > 0:
                    cells.append(p[e, a, vbs:vbe, rbs:rae].ravel())
                if vas < nv - 1:
                    cells.append(p[e, a, vas:vae, rbs:rae].ravel())
                if rbe > 0:
                    cells.append(p[e, a, vbe:vas, rbs:rbe].ravel())
                if ras < nr - 1:
                    cells.append(p[e, a, vbe:vas, ras:rae].ravel())
                t = np.concatenate(cells) if cells else np.array([])
                if t.size:
                    m = np.quantile(t, q, method="weibull")
                    if p[e, a, v, r] > m * tos:
                        mask[e, a, r] = 1
                        dop[e, a, r] = vbins[v]
    return mask, dop


def virtual_array_oracle(adc, txl, rxl):
    """TX/RX -> virtual (el, az) scatter (reference: radardsp.py:54-111)."""
    _, _, nc, ns = adc.shape
    ne = txl[:, 2].max() + rxl[:, 2].max() + 1
    na = txl[:, 1].max() + rxl[:, 1].max() + 1
    va = np.zeros((ne, na, nc, ns), dtype=np.complex128)
    for tidx, taz, tel in txl:
        for ridx, raz, rel in rxl:
            va[tel + rel, taz + raz] += adc[tidx, ridx]
    return va


def raeivv_oracle(adc, params, txl, rxl, vbins):
    """RAE intensity/velocity/validity map
    (reference: radar_preprocessing.py:6-62). NumPy, per-frame."""
    ntx, nrx, nc, ns = adc.shape
    x = adc * np.blackman(ns).reshape(1, 1, 1, -1)
    rfft = np.fft.fft(x, params.range_fftsize, -1)
    dfft = np.fft.fftshift(np.fft.fft(rfft, params.doppler_fftsize, -2), -2)
    tl = np.arange(ntx)
    cl = np.arange(-params.doppler_fftsize // 2, params.doppler_fftsize // 2)
    vcomp = np.exp(-2j * np.pi * np.kron(tl, cl) / (ntx * params.doppler_fftsize))
    dfft = dfft * vcomp.reshape(ntx, 1, params.doppler_fftsize, 1)
    va = virtual_array_oracle(dfft, txl, rxl)
    afft = np.fft.fftshift(np.fft.fft(va, params.azimuth_fftsize, 1), 1)
    efft = np.fft.fftshift(np.fft.fft(afft, params.elevation_fftsize, 0), 0)
    nr = efft.shape[-1]
    efft[..., : int(nr * params.crop_low)] = 0
    efft[..., nr - int(nr * params.crop_high) :] = 0
    power = np.abs(efft) ** 2
    vmax_idx = np.argmax(power, axis=2)
    vel = vbins[vmax_idx]
    srt = np.sort(power, axis=2)
    valid = srt[:, :, -1] * 0.70 > srt[:, :, -2]
    psum = power.sum(axis=2)
    noise = np.quantile(psum, 0.30)
    db = 10 * np.log10(psum / (noise + 1e-6) + 1)
    return np.stack(
        [db.transpose(2, 1, 0), vel.transpose(2, 1, 0), valid.transpose(2, 1, 0)],
        axis=-1,
    ).astype(np.float32)


def budgeted_topk_oracle(cube, budgets):
    """Per-slice top-k peak picking (reference: cache_test_cfar_utils.py:55-98)."""
    R = cube.shape[0]
    peaks, vals = [], []
    for r in range(R):
        n = int(budgets[r])
        if n == 0:
            continue
        flat = cube[r].ravel()
        idx = np.argsort(-flat, kind="stable")[:n]
        a, e = idx // cube.shape[2], idx % cube.shape[2]
        peaks.append(np.stack([np.full(n, r), a, e], axis=1))
        vals.append(flat[idx])
    return np.concatenate(peaks), np.concatenate(vals)


def weighted_allocation_oracle(weights, total):
    """(reference: cache_test_cfar_utils.py:100-141)."""
    w = np.asarray(weights, dtype=np.float64)
    n = len(w)
    if w.sum() == 0:
        base, rem = divmod(total, n)
        out = np.full(n, base, dtype=np.int64)
        out[:rem] += 1
        return out
    alloc = np.floor(w / w.sum() * total).astype(np.int64)
    alloc[np.argmax(w)] += total - alloc.sum()
    return alloc
