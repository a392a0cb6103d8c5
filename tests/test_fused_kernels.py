"""Differential tests for the round-2 inference fast paths.

Each fast path must match its reference (unfused/unfolded) flax twin:

- ``geglu_ff`` Pallas kernel (interpret mode on CPU) vs ``GEGLUFeedForward``
  — interpret-mode comparisons pin ``jax.default_matmul_precision("highest")``
  so their f32-calibrated tolerances also hold under ``RALD_TEST_TPU=1``,
  where the default f32 matmul runs at bf16 MXU precision (~1e-3)
- ``fused_self_attention_block`` (interpret mode) vs LN/mod + Attention +
  residual composed from flax modules
- ``fold_decode_tail`` decode vs the unfolded decode path (the fold is an
  exact linear-algebra reassociation; measured MORE accurate than the
  unfolded chain vs float64 — see docs/DESIGN.md)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rald_tpu.models.vecset_vae import create_autoencoder
from rald_tpu.nn.layers import Attention, GEGLUFeedForward
from rald_tpu.ops.attn_kernel import fused_self_attention_block
from rald_tpu.ops.geglu_kernel import geglu_ff


@pytest.fixture(autouse=True)
def _exact_f32_matmuls():
    """f32-exact matmuls on every backend: these tolerances were calibrated
    for true f32 references, but the TPU's default f32 matmul precision is
    bf16 (~1e-3), which swamps them under RALD_TEST_TPU=1."""
    with jax.default_matmul_precision("highest"):
        yield


def test_geglu_kernel_matches_flax():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 300, 128), jnp.float32)
    ff = GEGLUFeedForward(dtype=jnp.float32)
    params = ff.init(rng, x)["params"]
    ref = ff.apply({"params": params}, x)
    out = geglu_ff(
        x,
        params["proj_in"]["kernel"], params["proj_in"]["bias"],
        params["proj_out"]["kernel"], params["proj_out"]["bias"],
        block=128, interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_geglu_kernel_pads_ragged_tokens():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 37, 64), jnp.float32)
    ff = GEGLUFeedForward(dtype=jnp.float32)
    params = ff.init(rng, x)["params"]
    ref = ff.apply({"params": params}, x)
    out = geglu_ff(
        x,
        params["proj_in"]["kernel"], params["proj_in"]["bias"],
        params["proj_out"]["kernel"], params["proj_out"]["bias"],
        block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_ln_geglu_residual_adaln_mode():
    """x + FF(LN(x)*(1+s)+b) — the DiT block's FF sublayer — vs the flax
    composition (round-3 mod+residual fold)."""
    from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual

    rng = jax.random.PRNGKey(3)
    b, n, d = 2, 160, 64
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (b, 1, d)) * 0.1
    shift = jax.random.normal(jax.random.fold_in(rng, 2), (b, 1, d)) * 0.1
    ff = GEGLUFeedForward(dtype=jnp.float32)
    params = ff.init(rng, x)["params"]

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + scale) + shift
    ref = x + ff.apply({"params": params}, h)

    out = fused_ln_geglu_residual(
        x, scale, shift,
        params["proj_in"]["kernel"], params["proj_in"]["bias"],
        params["proj_out"]["kernel"], params["proj_out"]["bias"],
        scale_shift_mod=True, block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fused_ln_geglu_residual_auto_block_f32():
    """block=0 auto-selects the f32-safe row tile (256) and matches the
    explicit-block result — the strict-parity configuration (f32 compute on
    TPU) VMEM-OOMed at the bf16-sized tile of 512 before the dtype-aware
    default."""
    from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual

    rng = jax.random.PRNGKey(7)
    b, n, d = 1, 300, 64  # n > 256 so the auto tile actually splits rows
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (b, 1, d)) * 0.1
    shift = jax.random.normal(jax.random.fold_in(rng, 2), (b, 1, d)) * 0.1
    ff = GEGLUFeedForward(dtype=jnp.float32)
    params = ff.init(rng, x)["params"]
    args = (
        x, scale, shift,
        params["proj_in"]["kernel"], params["proj_in"]["bias"],
        params["proj_out"]["kernel"], params["proj_out"]["bias"],
    )
    auto = fused_ln_geglu_residual(*args, scale_shift_mod=True, interpret=True)
    explicit = fused_ln_geglu_residual(
        *args, scale_shift_mod=True, block=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(explicit))


def test_fused_ln_geglu_residual_affine_mode():
    """x + FF(LN_affine(x)) — the VAE SelfAttnBlock FF sublayer — including
    ragged token counts (pad path)."""
    from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual

    rng = jax.random.PRNGKey(4)
    b, n, d = 2, 90, 64
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (d,))
    beta = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (d,))
    ff = GEGLUFeedForward(dtype=jnp.float32)
    params = ff.init(rng, x)["params"]

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    h = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    ref = x + ff.apply({"params": params}, h)

    out = fused_ln_geglu_residual(
        x, gamma[None, None], beta[None, None],
        params["proj_in"]["kernel"], params["proj_in"]["bias"],
        params["proj_out"]["kernel"], params["proj_out"]["bias"],
        scale_shift_mod=False, block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fused_ff_flag_in_module():
    """GEGLUFeedForward(use_fused=True) matches the unfused module (interpret
    has no module-level hook, so run the kernel path only on TPU)."""
    if jax.default_backend() != "tpu":
        pytest.skip("module-level fused FF path is TPU-only")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 256, 128), jnp.bfloat16)
    ff = GEGLUFeedForward(dtype=jnp.bfloat16)
    ff_fused = GEGLUFeedForward(use_fused=True, dtype=jnp.bfloat16)
    params = ff.init(rng, x)["params"]
    # the module fixture pins "highest" here on purpose: the kernels pin
    # DEFAULT on their own dots (Mosaic rejects fp32 contract precision on
    # bf16/int8 operands), so this also regression-tests that the fused path
    # survives a global system.matmul_precision: highest (the torch-parity
    # knob) instead of crashing the compile
    a = np.asarray(ff.apply({"params": params}, x), np.float32)
    b = np.asarray(ff_fused.apply({"params": params}, x), np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2, rtol=3e-2)


def test_fused_attention_block_matches_flax():
    """LN(+AdaLN mod) + 8-head attention + out-proj + residual."""
    rng = jax.random.PRNGKey(2)
    b, n, d, heads = 2, 128, 128, 2
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (b, 1, d)) * 0.1
    shift = jax.random.normal(jax.random.fold_in(rng, 2), (b, 1, d)) * 0.1

    attn = Attention(heads=heads, dim_head=d // heads, fused_kv=False, dtype=jnp.float32)
    params = attn.init(rng, x)["params"]

    def ln(t):
        m = jnp.mean(t, -1, keepdims=True)
        v = jnp.mean(jnp.square(t), -1, keepdims=True) - jnp.square(m)
        return (t - m) * jax.lax.rsqrt(v + 1e-5)

    h = ln(x) * (1 + scale) + shift
    ref = x + attn.apply({"params": params}, h)

    out = fused_self_attention_block(
        x, scale, shift,
        params["to_q"]["kernel"], params["to_k"]["kernel"],
        params["to_v"]["kernel"], params["to_out"]["kernel"],
        params["to_out"]["bias"],
        heads=heads, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fused_attention_block_plain_ln():
    """scale_shift_mod=False: plain LayerNorm scale/bias (VAE block form)."""
    rng = jax.random.PRNGKey(3)
    b, n, d, heads = 1, 128, 128, 2
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (d,))
    beta = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (d,))

    attn = Attention(heads=heads, dim_head=d // heads, fused_kv=True, dtype=jnp.float32)
    params = attn.init(rng, x)["params"]
    kv = params["to_kv"]["kernel"]
    wk, wv = jnp.split(kv, 2, axis=-1)

    def ln(t):
        m = jnp.mean(t, -1, keepdims=True)
        v = jnp.mean(jnp.square(t), -1, keepdims=True) - jnp.square(m)
        return (t - m) * jax.lax.rsqrt(v + 1e-5)

    h = ln(x) * gamma + beta
    ref = x + attn.apply({"params": params}, h)

    out = fused_self_attention_block(
        x, gamma[None, None], beta[None, None],
        params["to_q"]["kernel"], wk, wv,
        params["to_out"]["kernel"], params["to_out"]["bias"],
        heads=heads, scale_shift_mod=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fold_decode_tail_matches_unfolded():
    kw = dict(dim=512, M=128, latent_dim=8, N=256, query_type="learnable")
    vae = create_autoencoder(**kw)
    vae_fold = create_autoencoder(**kw, fold_decode_tail=True)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, 128, 8))
    q = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 500, 3), minval=-1, maxval=1)
    params = vae.init(
        {"params": rng, "latent": jax.random.fold_in(rng, 2)},
        jnp.zeros((2, 256, 3)), jnp.zeros((2, 8, 3)),
    )["params"]
    a = np.asarray(vae.apply({"params": params}, z, q, method="decode"))
    b = np.asarray(vae_fold.apply({"params": params}, z, q, method="decode"))
    # the two paths differ only by float reassociation of the linear tail
    # (the folded path is the more accurate one vs float64)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert np.mean((a > 0) == (b > 0)) > 0.999


def test_fold_decode_tail_exact_algebra():
    """The fold is exact linear algebra: verify against a float64 numpy twin."""
    rng = np.random.default_rng(0)
    m, d = 64, 32
    attn = rng.random((5, m)).astype(np.float64)
    attn /= attn.sum(-1, keepdims=True)
    v = rng.standard_normal((m, d))
    wo = rng.standard_normal((d, d)) * 0.1
    bo = rng.standard_normal(d) * 0.1
    wh = rng.standard_normal((d, 1)) * 0.1
    bh = rng.standard_normal(1) * 0.1
    unfolded = (attn @ v @ wo + bo) @ wh + bh
    folded = attn @ (v @ (wo @ wh)) + (bo @ wh + bh)
    np.testing.assert_allclose(unfolded, folded, rtol=1e-12)


def test_constant_shift_softmax_ratio():
    """The decode tail's constant-shift exp (``exp(clip(sim,-45,80) - 40)``)
    yields the same numerator/denominator ratio as the row-max softmax shift
    for all logits inside the clip window, including rows pinned at the
    edges (all ~-45, all ~80, and maximal spread)."""
    rng = np.random.default_rng(1)
    m = 512
    rows = np.stack([
        rng.uniform(-30, 30, m),            # trained-logit regime
        np.full(m, -45.0) + rng.uniform(0, 1e-3, m),   # all at the low edge
        np.full(m, 80.0) - rng.uniform(0, 1e-3, m),    # all at the high edge
        rng.uniform(-45, 80, m),            # maximal in-window spread
    ]).astype(np.float32)
    v2 = rng.standard_normal((m, 2)).astype(np.float32)
    v2[:, 1] = np.abs(v2[:, 1]) + 0.5  # denominator column positive

    e_ref = np.exp(rows - rows.max(-1, keepdims=True))
    nd = e_ref @ v2
    ref = nd[:, 0] / nd[:, 1]

    e_shift = np.exp(np.clip(rows, -45.0, 80.0) - 40.0)
    assert np.all(np.isfinite(e_shift)) and np.all(e_shift > 0)  # no FTZ/overflow
    nd2 = e_shift @ v2
    got = nd2[:, 0] / nd2[:, 1]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)




def test_erf_poly_accuracy():
    """The int8 kernels' transcendental-free GELU: the endpoint-constrained
    odd-poly erf stays within its documented bound everywhere (|err| <=
    9.3e-5 in-range; the input clamp saturates the output to sign(x) within
    1 f32 ulp beyond |x|=3, so <= 1-erf(3) = 2.2e-5 there — all far below
    the int8 path's ~8e-3 per-token quantization noise). The range
    deliberately extends far past the fit interval: saturation must hold
    for arbitrarily large |x| (an earlier unconstrained fit saturated at
    0.99972 and leaked a ~1.4e-4*|x| linear tail into GELU for
    large-negative gates; the constrained fit's residual tail slope is
    ~3e-8*|x|)."""
    from rald_tpu.ops.geglu_kernel import _erf_poly, _gelu_poly

    x = jnp.linspace(-50.0, 50.0, 200001, dtype=jnp.float32)
    err = jnp.max(jnp.abs(_erf_poly(x) - jax.scipy.special.erf(x)))
    assert float(err) < 1e-4, float(err)
    g_err = jnp.max(jnp.abs(_gelu_poly(x) - jax.nn.gelu(x, approximate=False)))
    assert float(g_err) < 3e-4, float(g_err)
    # beyond the fit range the saturation is exact to 1 f32 ulp:
    # erf -> sign(x) +- 6e-8, gelu tail |err| <= 3e-8 * |x|
    far = jnp.asarray([-1e4, -40.0, 40.0, 1e4], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(_erf_poly(far)), np.sign(far),
                               rtol=0, atol=1.2e-7)
    g_far = np.asarray(_gelu_poly(far))
    np.testing.assert_allclose(g_far, np.maximum(far, 0.0),
                               rtol=6e-8, atol=3.5e-4)


def test_int8_ff_kernel_accuracy():
    """int8-weight FF kernel (quantized inference): per-sublayer error vs
    the f32 composition stays within dynamic-quantization tolerance."""
    from rald_tpu.ops.geglu_kernel import (
        fused_ln_geglu_residual_int8, quantize_cols,
    )

    rng = jax.random.PRNGKey(7)
    b, n, d, inner = 2, 160, 64, 256
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = 0.1 * jax.random.normal(ks[1], (b, 1, d))
    sh = 0.1 * jax.random.normal(ks[2], (b, 1, d))
    w1 = jax.random.normal(ks[3], (d, 2 * inner)) * (d ** -0.5)
    b1 = 0.01 * jax.random.normal(ks[4], (2 * inner,))
    w2 = jax.random.normal(ks[5], (inner, d)) * (inner ** -0.5)
    b2 = 0.01 * jax.random.normal(ks[6], (d,))

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + sc) + sh
    p = h @ w1 + b1
    g = p[..., :inner] * jax.nn.gelu(p[..., inner:], approximate=False)
    ref = np.asarray(x + g @ w2 + b2)

    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    out = np.asarray(fused_ln_geglu_residual_int8(
        x, sc, sh, w1q, s1, b1, w2q, s2, b2, block=128, interpret=True,
    ), np.float32)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert rel < 0.05 and corr > 0.999, (rel, corr)


def test_int8_ff_static_kernel_accuracy():
    """Static-activation-scale int8 FF kernel vs the f32 composition, with
    scales set to the true activation amax (ideal calibration): the error
    envelope must match the dynamic-quant kernel's (the static path only
    changes HOW the quantization scale is obtained)."""
    from rald_tpu.ops.geglu_kernel import (
        fused_ln_geglu_residual_int8_static, quantize_cols,
    )

    rng = jax.random.PRNGKey(9)
    b, n, d, inner = 2, 160, 64, 256
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = 0.1 * jax.random.normal(ks[1], (b, 1, d))
    sh = 0.1 * jax.random.normal(ks[2], (b, 1, d))
    w1 = jax.random.normal(ks[3], (d, 2 * inner)) * (d ** -0.5)
    b1 = 0.01 * jax.random.normal(ks[4], (2 * inner,))
    w2 = jax.random.normal(ks[5], (inner, d)) * (inner ** -0.5)
    b2 = 0.01 * jax.random.normal(ks[6], (d,))

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + sc) + sh
    p = h @ w1 + b1
    g = p[..., :inner] * jax.nn.gelu(p[..., inner:], approximate=False)
    ref = np.asarray(x + g @ w2 + b2)
    ah = jnp.max(jnp.abs(h))  # ideal calibration: the true amax
    ag = jnp.max(jnp.abs(g))

    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    out = np.asarray(fused_ln_geglu_residual_int8_static(
        x, sc, sh,
        w1q, s1 * (ah / 127.0), b1,
        w2q, s2 * (ag / 127.0), b2,
        (127.0 / ah).reshape(1, 1), (127.0 / ag).reshape(1, 1),
        block=128, interpret=True,
    ), np.float32)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert rel < 0.05 and corr > 0.999, (rel, corr)


def test_int8_ff_static_kernel_saturates_beyond_calibration():
    """Activations beyond the calibrated amax must SATURATE (int8 clip
    semantics), not wrap: with scales calibrated 4x too small the output
    degrades gracefully (finite, still correlated with the f32 reference)."""
    from rald_tpu.ops.geglu_kernel import (
        fused_ln_geglu_residual_int8_static, quantize_cols,
    )

    rng = jax.random.PRNGKey(11)
    b, n, d, inner = 1, 128, 64, 128
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = jnp.zeros((b, 1, d))
    sh = jnp.zeros((b, 1, d))
    w1 = jax.random.normal(ks[3], (d, 2 * inner)) * (d ** -0.5)
    b1 = jnp.zeros((2 * inner,))
    w2 = jax.random.normal(ks[5], (inner, d)) * (inner ** -0.5)
    b2 = jnp.zeros((d,))

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x)
    p = h @ w1
    g = p[..., :inner] * jax.nn.gelu(p[..., inner:], approximate=False)
    ref = np.asarray(x + g @ w2)
    ah = jnp.max(jnp.abs(h)) / 4.0  # deliberately mis-calibrated
    ag = jnp.max(jnp.abs(g)) / 4.0

    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    out = np.asarray(fused_ln_geglu_residual_int8_static(
        x, sc, sh,
        w1q, s1 * (ah / 127.0), b1,
        w2q, s2 * (ag / 127.0), b2,
        (127.0 / ah).reshape(1, 1), (127.0 / ag).reshape(1, 1),
        block=128, interpret=True,
    ), np.float32)
    assert np.isfinite(out).all()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9, corr  # clipped, degraded — but not wrapped garbage


def test_geglu_sow_amax_collection():
    """GEGLUFeedForward(sow_amax=True) sows the two activation amax values
    the int8 kernel quantizes: max |input| and max |gated product|."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 40, 32), jnp.float32)
    ff = GEGLUFeedForward(sow_amax=True, dtype=jnp.float32)
    variables = ff.init(rng, x)
    params = variables["params"]
    out, vs = ff.apply({"params": params}, x, mutable=["quant_stats"])
    qs = vs["quant_stats"]
    h_amax = float(qs["h_amax"][0])
    g_amax = float(qs["g_amax"][0])
    np.testing.assert_allclose(h_amax, float(jnp.max(jnp.abs(x))), rtol=1e-6)
    p = x @ params["proj_in"]["kernel"] + params["proj_in"]["bias"]
    inner = p.shape[-1] // 2
    g = p[..., :inner] * jax.nn.gelu(p[..., inner:], approximate=False)
    np.testing.assert_allclose(g_amax, float(jnp.max(jnp.abs(g))), rtol=1e-5)
    # and the sow must not change the module output
    ref = ff.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_ff_static_module_threading():
    """LatentArrayTransformer.forward_with_mods routes per-block act_scales
    into the static int8 kernel (pallas interpret mode on CPU): the static
    path tracks the f32 reference as closely as the dynamic path does, and
    differs from it (different quantization grid) — i.e. the scales are
    actually being used."""
    from jax.experimental.pallas import tpu as pltpu

    from rald_tpu.models.latent_dit import LatentArrayTransformer
    from rald_tpu.ops.geglu_kernel import quantize_ff_tree

    kw = dict(in_channels=8, n_heads=2, d_head=16, depth=2)
    ref_model = LatentArrayTransformer(**kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 16, 8))
    t = jnp.ones((1,))
    params = ref_model.init(rng, x, t)["params"]
    # proj_out is zero-init (DiT convention) — randomize it so outputs are
    # non-trivial to compare
    params["proj_out"]["kernel"] = 0.1 * jax.random.normal(
        jax.random.fold_in(rng, 2), params["proj_out"]["kernel"].shape
    )
    q = quantize_ff_tree(params)
    mods = ref_model.apply({"params": params}, t, method="compute_mods")
    ref = np.asarray(ref_model.apply(
        {"params": params}, x, mods, method="forward_with_mods"
    ), np.float32)

    # true per-block amax via the calibration sow
    sow_model = LatentArrayTransformer(sow_quant_stats=True, **kw)
    _, vs = sow_model.apply(
        {"params": params}, x, mods, method="forward_with_mods",
        mutable=["quant_stats"],
    )
    sc = tuple(
        (vs["quant_stats"][f"block_{i}"]["ff"]["h_amax"][0],
         vs["quant_stats"][f"block_{i}"]["ff"]["g_amax"][0])
        for i in range(2)
    )

    dyn_model = LatentArrayTransformer(use_fused_ff=True, use_int8_ff=True, **kw)
    sta_model = LatentArrayTransformer(use_fused_ff=True, use_int8_ff="static", **kw)
    with pltpu.force_tpu_interpret_mode():
        dyn = np.asarray(dyn_model.apply(
            {"params": params, "int8": q}, x, mods, method="forward_with_mods"
        ), np.float32)
        sta = np.asarray(sta_model.apply(
            {"params": params, "int8": q}, x, mods, method="forward_with_mods",
            act_scales=sc,
        ), np.float32)
        # static without scales falls back to the dynamic kernel exactly
        fallback = np.asarray(sta_model.apply(
            {"params": params, "int8": q}, x, mods, method="forward_with_mods"
        ), np.float32)

    scale = np.abs(ref).max()
    assert np.abs(sta - ref).max() / scale < 0.08
    assert np.abs(dyn - ref).max() / scale < 0.08
    np.testing.assert_array_equal(fallback, dyn)
    assert np.abs(sta - dyn).max() > 0  # different quant grids — scales in use


def test_quantize_ff_tree_structure():
    """quantize_ff_tree mirrors the params tree: every DiT block's ff node
    gains {w1q, s1, w2q, s2} at the same path, and w_q*s reconstructs w."""
    from rald_tpu.models.latent_dit import LatentArrayTransformer
    from rald_tpu.ops.geglu_kernel import quantize_ff_tree

    model = LatentArrayTransformer(in_channels=8, n_heads=2, d_head=16, depth=2)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 16, 8)), jnp.ones((1,)))["params"]
    q = quantize_ff_tree(params)
    assert set(q) == {"block_0", "block_1"}
    for blk in q.values():
        assert set(blk) == {"ff"}
        assert set(blk["ff"]) == {"w1q", "s1", "w2q", "s2"}
        assert blk["ff"]["w1q"].dtype == jnp.int8
    w = params["block_0"]["ff"]["proj_in"]["kernel"]
    recon = q["block_0"]["ff"]["w1q"].astype(jnp.float32) * q["block_0"]["ff"]["s1"]
    np.testing.assert_allclose(np.asarray(recon), np.asarray(w), atol=np.abs(w).max() / 200)


def test_int8_attn_kernel_accuracy():
    """int8-projection fused self-attn sublayer vs the f32 composition."""
    from rald_tpu.ops.attn_kernel import (
        fused_self_attention_block_int8, quantize_attn_tree,
    )

    rng = jax.random.PRNGKey(11)
    b, n, d, heads = 2, 128, 64, 4
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = 0.1 * jax.random.normal(ks[1], (b, 1, d))
    sh = 0.1 * jax.random.normal(ks[2], (b, 1, d))
    ws = {name: jax.random.normal(k, (d, d)) * (d ** -0.5)
          for name, k in zip(("to_q", "to_k", "to_v", "to_out"), ks[3:7])}
    bo = 0.01 * jax.random.normal(ks[7], (d,))

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + sc) + sh
    q, k, v = h @ ws["to_q"], h @ ws["to_k"], h @ ws["to_v"]
    dh = d // heads
    qh = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    att = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) * dh ** -0.5, axis=-1)
    out = (att @ vh).transpose(0, 2, 1, 3).reshape(b, n, d)
    ref = np.asarray(x + out @ ws["to_out"] + bo)

    qt = quantize_attn_tree({"attn1": {
        name: {"kernel": w} for name, w in ws.items()
    }})["attn1"]
    got = np.asarray(fused_self_attention_block_int8(
        x, sc, sh,
        qt["to_q_q"], qt["to_q_s"], qt["to_k_q"], qt["to_k_s"],
        qt["to_v_q"], qt["to_v_s"], qt["to_out_q"], qt["to_out_s"],
        bo, heads=heads, interpret=True,
    ), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert rel < 0.05 and corr > 0.999, (rel, corr)


def test_int8_vout_attn_kernel_accuracy():
    """v/out-only int8 attention (bf16 q/k): tighter than full-int8 since
    quantization error never passes through the softmax."""
    from rald_tpu.ops.attn_kernel import (
        fused_self_attention_block_int8_vout, quantize_attn_tree,
    )

    rng = jax.random.PRNGKey(12)
    b, n, d, heads = 2, 128, 64, 4
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32)
    sc = 0.1 * jax.random.normal(ks[1], (b, 1, d))
    sh = 0.1 * jax.random.normal(ks[2], (b, 1, d))
    ws = {name: jax.random.normal(k, (d, d)) * (d ** -0.5)
          for name, k in zip(("to_q", "to_k", "to_v", "to_out"), ks[3:7])}
    bo = 0.01 * jax.random.normal(ks[7], (d,))

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + sc) + sh
    q, k, v = h @ ws["to_q"], h @ ws["to_k"], h @ ws["to_v"]
    dh = d // heads
    qh = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    att = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) * dh ** -0.5, axis=-1)
    out = (att @ vh).transpose(0, 2, 1, 3).reshape(b, n, d)
    ref = np.asarray(x + out @ ws["to_out"] + bo)

    qt = quantize_attn_tree({"attn1": {
        name: {"kernel": w} for name, w in ws.items()
    }})["attn1"]
    got = np.asarray(fused_self_attention_block_int8_vout(
        x, sc, sh,
        ws["to_q"], ws["to_k"],
        qt["to_v_q"], qt["to_v_s"], qt["to_out_q"], qt["to_out_s"],
        bo, heads=heads, interpret=True,
    ), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert rel < 0.03 and corr > 0.9995, (rel, corr)
