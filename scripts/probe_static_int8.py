"""Per-sublayer probe: dynamic vs static activation scales in the int8 FF
kernel at the bench operating shapes ((B, 512, 512) x inner 2048).

The roofline table (docs/DESIGN.md) puts the dynamic int8 FF sublayer at
0.560 ms (batch 32) against a 0.409 ms int8-MXU floor, the gap being the
VPU chain: LN, per-token max reductions, per-row rescales, poly-GELU. The
static variant drops the max reductions and per-row rescales; this probe
measures what that buys per sublayer, isolated.

Usage: python scripts/probe_static_int8.py [BATCH ...]   (default 16 32)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from rald_tpu.ops.geglu_kernel import (
    fused_ln_geglu_residual_int8,
    fused_ln_geglu_residual_int8_static,
    quantize_cols,
)


def _sync(x):
    return np.asarray(x[0, 0, :1])


def time_fn(fn, *args, reps=100):
    """Device time per call: `reps` dependent calls inside ONE jitted
    fori_loop (same methodology as the perf_probe6 numbers in
    docs/DESIGN.md's roofline table — per-dispatch tunnel overhead would
    otherwise dominate sub-ms kernels)."""

    @jax.jit
    def looped(x, *rest):
        def body(_, y):
            # feed the output back in so iterations can't be elided
            return fn(y, *rest)

        return jax.lax.fori_loop(0, reps, body, x)

    _sync(looped(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(looped(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16, 32]
    d, inner = 512, 2048
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    w1 = jax.random.normal(ks[0], (d, 2 * inner)) * (d ** -0.5)
    b1 = 0.01 * jax.random.normal(ks[1], (2 * inner,))
    w2 = jax.random.normal(ks[2], (inner, d)) * (inner ** -0.5)
    b2 = 0.01 * jax.random.normal(ks[3], (d,))
    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    ah = jnp.float32(4.0)
    ag = jnp.float32(2.0)
    d1 = s1 * (ah / 127.0)
    d2 = s2 * (ag / 127.0)
    ih = (127.0 / ah).reshape(1, 1)
    ig = (127.0 / ag).reshape(1, 1)

    for b in batches:
        x = jax.random.normal(ks[4], (b, 512, d), jnp.bfloat16)
        sc = 0.1 * jax.random.normal(ks[5], (b, 1, d), jnp.bfloat16)
        sh = 0.1 * jax.random.normal(ks[6], (b, 1, d), jnp.bfloat16)
        t_dyn = time_fn(
            fused_ln_geglu_residual_int8, x, sc, sh, w1q, s1, b1, w2q, s2, b2
        )
        t_sta = time_fn(
            fused_ln_geglu_residual_int8_static,
            x, sc, sh, w1q, d1, b1, w2q, d2, b2, ih, ig,
        )
        print(
            f"batch {b:3d}: dynamic {t_dyn*1e3:6.3f} ms  "
            f"static {t_sta*1e3:6.3f} ms  ({(t_dyn-t_sta)/t_dyn*100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
