"""Shared neural-net primitives (flax.linen), TPU-first.

Capability parity with the reference's hand-rolled torch modules:

- :class:`Attention`      <- ``model/models_ae.py:70-105`` (Attention) and
                             ``model/models_radar_generation.py:35-76``
                             (CrossAttention) — one module covers both: the
                             fused/split kv projection is a weight-layout
                             detail, not a math difference.
- :class:`GEGLUFeedForward` <- ``models_ae.py:51-68`` / ``models_radar_generation.py:88-117``.
- :class:`PointEmbed`     <- ``models_ae.py:108-138`` (2^k*pi Fourier basis).
- :class:`AdaLayerNorm`   <- ``models_radar_generation.py:119-131``.
- :class:`FourierTimeEmbedding` <- ``models_radar_generation.py:20-33``.
- :class:`DropPath`       <- timm DropPath used at ``models_ae.py:315-316``.

TPU notes: all matmuls go through ``nn.Dense`` with a configurable compute
``dtype`` (bf16 on TPU keeps the MXU fed; params stay f32). Attention is a
plain einsum softmax — at the reference's sizes (512 tokens, <=64 cond
tokens) XLA fuses this into MXU-friendly code; the million-query decoder
cross-attention instead uses the streaming kernel in
:mod:`rald_tpu.ops.query_attention`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def point_fourier_basis(hidden_dim: int) -> np.ndarray:
    """Block-diagonal (3, hidden_dim//2) basis of 2^k * pi frequencies.

    Matches reference ``models_ae.py:115-124``: row a has frequencies
    ``2^k * pi`` in columns [a*K, (a+1)*K), zeros elsewhere (K = hidden//6).
    """
    assert hidden_dim % 6 == 0
    k = hidden_dim // 6
    e = (2.0 ** np.arange(k, dtype=np.float64)) * np.pi
    basis = np.zeros((3, 3 * k), dtype=np.float32)
    for axis in range(3):
        basis[axis, axis * k : (axis + 1) * k] = e
    return basis


class PointEmbed(nn.Module):
    """Fourier positional embedding of 3D points -> ``dim`` channels."""

    dim: int = 512
    hidden_dim: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jax.Array) -> jax.Array:
        basis = jnp.asarray(point_fourier_basis(self.hidden_dim))
        # project in f32: frequencies up to 2^7*pi need precision before sin
        proj = jnp.einsum("...d,de->...e", pts.astype(jnp.float32), basis)
        feats = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), pts.astype(jnp.float32)], axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="mlp")(feats.astype(self.dtype))


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale kept paths by 1/(1-p))."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Attention(nn.Module):
    """Multi-head softmax attention with optional cross-attention context.

    ``fused_kv`` selects the weight layout: the VAE's attention uses one
    ``to_kv`` matrix (models_ae.py:79), the DiT uses split ``to_k``/``to_v``
    (models_radar_generation.py:47-48). Math is identical; layout matters only
    for checkpoint conversion.

    (The stock Pallas flash-attention kernel was measured 1.85x SLOWER than
    this einsum path at the 512-token shapes — docs/DESIGN.md round 2 — so
    there is deliberately no flash option here.)
    """

    heads: int = 8
    dim_head: int = 64
    out_dim: Optional[int] = None
    fused_kv: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if self.fused_kv:
            kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(ctx)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head**-0.5
        sim = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
        if mask is not None:
            sim = jnp.where(mask != 0, jnp.finfo(sim.dtype).min, sim)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], inner)
        out = nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)
        return DropPath(self.drop_path_rate, name="drop_path")(out, deterministic)


class GEGLUFeedForward(nn.Module):
    """Linear -> GEGLU -> Linear (reference models_ae.py:56-68).

    ``use_fused`` routes through the Pallas kernel in
    :mod:`rald_tpu.ops.geglu_kernel`, which keeps the (tokens, 2*inner)
    projection and the gated product in VMEM instead of round-tripping HBM
    between the two matmuls. Inference-only (no autodiff rule) and TPU-only;
    training and CPU tests keep the unfused path.

    ``sow_amax`` (unfused path only) sows ``max |input|`` and ``max |gated
    product|`` into the ``"quant_stats"`` collection — the two activation
    tensors the int8 FF kernel quantizes. Run with
    ``mutable=["quant_stats"]`` to collect; used by the static-activation-
    scale calibration pass (``GenerationEngine.calibrate_act_scales``).
    """

    mult: int = 4
    out_dim: Optional[int] = None
    drop_path_rate: float = 0.0
    use_fused: bool = False
    sow_amax: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        out_dim = self.out_dim if self.out_dim is not None else dim
        inner = dim * self.mult
        if self.use_fused and not self.is_initializing():
            from rald_tpu.ops.geglu_kernel import geglu_ff

            p = self.variables["params"]
            h = geglu_ff(
                x.astype(self.dtype),
                p["proj_in"]["kernel"], p["proj_in"]["bias"],
                p["proj_out"]["kernel"], p["proj_out"]["bias"],
            )
        else:
            if self.sow_amax and not self.is_initializing():
                self.sow("quant_stats", "h_amax", jnp.max(jnp.abs(x.astype(jnp.float32))))
            h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            h, gates = jnp.split(h, 2, axis=-1)
            # exact (erf) gelu: torch F.gelu default — checkpoint parity matters
            h = h * jax.nn.gelu(gates, approximate=False)
            if self.sow_amax and not self.is_initializing():
                self.sow("quant_stats", "g_amax", jnp.max(jnp.abs(h.astype(jnp.float32))))
            h = nn.Dense(out_dim, dtype=self.dtype, name="proj_out")(h)
        return DropPath(self.drop_path_rate, name="drop_path")(h, deterministic)


class AdaLayerNorm(nn.Module):
    """LayerNorm modulated by a timestep embedding (models_radar_generation.py:119-131).

    ``mod`` and ``apply_mod`` are exposed separately so samplers can hoist
    the sigma-dependent modulation out of the NFE loop (the schedule's
    sigmas are fixed, so all 3*depth modulation projections can be computed
    once per sampling call instead of 2*num_steps-1 times).
    """

    dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.mod_dense = nn.Dense(2 * self.dim, dtype=self.dtype, name="mod")
        self.ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, dtype=self.dtype)

    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        return self.apply_mod(x, *self.mod(t_emb))

    def mod(self, t_emb: jax.Array):
        scale, shift = jnp.split(self.mod_dense(t_emb), 2, axis=-1)
        return scale, shift

    def apply_mod(self, x: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
        return self.ln(x) * (1 + scale) + shift


class FourierTimeEmbedding(nn.Module):
    """EDM noise-level embedding (models_radar_generation.py:20-33).

    Returns ``concat([cos(t f), sin(t f)])`` with geometric frequencies —
    cos first, matching the reference.
    """

    num_channels: int = 256
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        ang = t.astype(jnp.float32)[..., None] * freqs
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
