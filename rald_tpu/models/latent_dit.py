"""Stage-2 latent diffusion model: AdaLN latent transformer + EDM preconditioner.

Capability parity with ``model/models_radar_generation.py``:

- :class:`LatentDiTBlock`        <- ``BasicTransformerBlock`` (:133-169):
  self-attn, cross-attn to condition tokens, gated-GEGLU FF, each behind an
  AdaLayerNorm modulated by the noise-level embedding.
- :class:`LatentArrayTransformer` <- :171-233: linear in-proj, ``depth``
  blocks, final LayerNorm, zero-initialized linear out-proj; noise embedding
  = Fourier features -> 2-layer silu MLP.
- :class:`EDMPrecond`            <- :314-449: EDM c_skip/c_out/c_in/c_noise
  preconditioning around the transformer, plus radar conditioning
  (``process_radar_cond`` :363-407): intensity-only slice -> optional
  in-graph 3D-CNN radar encoder -> linear token projection -> factored
  R/A/E learned positional embeddings -> flattened (B, R*A*E, C) tokens.

TPU notes:
- Condition tokens are computed ONCE per call chain and passed down — the
  reference recomputes ``process_radar_cond`` (including the full 3D-CNN
  encoder) inside every one of the sampler's 35 NFEs (:412-415); here the
  sampler precomputes them outside its ``lax.scan`` (see
  :mod:`rald_tpu.diffusion.edm`), a ~35x saving on conditioning compute.
- The frozen-radar-encoder path takes *pre-encoded* (B, R', A', E', z) tokens
  (the reference applies the frozen encoder in the engine,
  ``engine_generation.py:85-87``; its in-model intensity slice :378 would
  break on such inputs — dead code in the published configs — so here the
  slice applies only to raw cubes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rald_tpu.nn.layers import AdaLayerNorm, Attention, FourierTimeEmbedding, GEGLUFeedForward
from rald_tpu.models.radar_encoder3d import RadarEncoder3D

Dtype = jnp.dtype


class LatentDiTBlock(nn.Module):
    n_heads: int = 8
    d_head: int = 64
    use_fused_ff: bool = False
    use_fused_attn: bool = False
    # quantized inference: FF / self-attn projection matmuls in int8
    # (weights per-column static, activations per-token dynamic). Lossy —
    # opt-in, eval-only; requires an "int8" collection built by
    # ops.geglu_kernel.quantize_ff_tree / ops.attn_kernel.quantize_attn_tree.
    # use_int8_ff: False | True (dynamic per-token activation scales) |
    # "static" (calibrated per-(schedule-step, block) activation scales fed
    # through apply_with_mods' ``act_scales`` — drops the per-token max
    # reductions from the kernel's VPU chain; falls back to dynamic when no
    # act_scales are passed).
    # use_int8_attn: False | True/"full" (all four projections) | "vout"
    # (v/out only — q/k stay bf16 so no softmax error amplification).
    use_int8_ff: bool | str = False
    use_int8_attn: bool | str = False
    # calibration: sow per-block FF activation amax into "quant_stats"
    # (unfused FF path only — build the model with use_fused_ff=False)
    sow_quant_stats: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.n_heads * self.d_head
        self.norm1 = AdaLayerNorm(dim=inner, dtype=self.dtype)
        self.attn1 = Attention(
            heads=self.n_heads, dim_head=self.d_head, fused_kv=False, dtype=self.dtype,
        )
        self.norm2 = AdaLayerNorm(dim=inner, dtype=self.dtype)
        self.attn2 = Attention(heads=self.n_heads, dim_head=self.d_head, fused_kv=False, dtype=self.dtype)
        self.norm3 = AdaLayerNorm(dim=inner, dtype=self.dtype)
        self.ff = GEGLUFeedForward(
            use_fused=self.use_fused_ff, sow_amax=self.sow_quant_stats, dtype=self.dtype
        )

    def mods(self, t_emb: jax.Array):
        """All three sigma-dependent (scale, shift) pairs for this block."""
        return (self.norm1.mod(t_emb), self.norm2.mod(t_emb), self.norm3.mod(t_emb))

    def apply_with_mods(
        self,
        x: jax.Array,
        mods,
        cond: Optional[jax.Array] = None,
        deterministic: bool = True,
        act_scales=None,
    ) -> jax.Array:
        (s1, b1), (s2, b2), (s3, b3) = mods
        if (self.use_int8_attn and not self.is_initializing()
                and "int8" in self.variables):
            # quantized self-attn sublayer: the four (D, D) projections run
            # int8 on the MXU inside the fused kernel (scores/softmax/values
            # stay f32/bf16) — rald_tpu.ops.attn_kernel
            p = self.variables["params"]["attn1"]
            q = self.variables["int8"]["attn1"]
            if self.use_int8_attn == "vout":
                from rald_tpu.ops.attn_kernel import (
                    fused_self_attention_block_int8_vout,
                )

                x = fused_self_attention_block_int8_vout(
                    x.astype(self.dtype), s1, b1,
                    p["to_q"]["kernel"], p["to_k"]["kernel"],
                    q["to_v_q"], q["to_v_s"], q["to_out_q"], q["to_out_s"],
                    p["to_out"]["bias"],
                    heads=self.n_heads,
                )
            else:
                from rald_tpu.ops.attn_kernel import fused_self_attention_block_int8

                x = fused_self_attention_block_int8(
                    x.astype(self.dtype), s1, b1,
                    q["to_q_q"], q["to_q_s"], q["to_k_q"], q["to_k_s"],
                    q["to_v_q"], q["to_v_s"], q["to_out_q"], q["to_out_s"],
                    p["to_out"]["bias"],
                    heads=self.n_heads,
                )
        elif self.use_fused_attn and not self.is_initializing():
            # whole sublayer (AdaLN mod + LN + MHA + out-proj + residual) in
            # one VMEM-resident Pallas kernel (rald_tpu.ops.attn_kernel)
            from rald_tpu.ops.attn_kernel import fused_self_attention_block

            p = self.variables["params"]["attn1"]
            x = fused_self_attention_block(
                x, s1, b1,
                p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"],
                p["to_out"]["kernel"], p["to_out"]["bias"],
                heads=self.n_heads,
            )
        else:
            x = x + self.attn1(self.norm1.apply_mod(x, s1, b1), deterministic=deterministic)
        # cross-attn stays on XLA's einsum path: a fused int8-out sublayer
        # kernel was measured 26 ms SLOWER at batch 16 (docs/DESIGN.md
        # "int8/fused cross-attn: measured dead end")
        x = x + self.attn2(
            self.norm2.apply_mod(x, s2, b2), context=cond, deterministic=deterministic
        )
        if self.use_fused_ff and not self.is_initializing():
            # whole FF sublayer (AdaLN mod + LN + GEGLU FF + residual) in one
            # VMEM-resident Pallas kernel: the LN output and modulated
            # activations never touch HBM (rald_tpu.ops.geglu_kernel)
            p = self.variables["params"]["ff"]
            if self.use_int8_ff and "int8" in self.variables:
                q = self.variables["int8"]["ff"]
                if self.use_int8_ff == "static" and act_scales is not None:
                    # calibrated per-(step, block) activation scales: the
                    # kernel quantizes with fixed scalars instead of
                    # per-token max reductions (ops.geglu_kernel docstring)
                    from rald_tpu.ops.geglu_kernel import (
                        fused_ln_geglu_residual_int8_static,
                    )

                    ah, ag = act_scales
                    ah = jnp.maximum(ah.astype(jnp.float32), 1e-6)
                    ag = jnp.maximum(ag.astype(jnp.float32), 1e-6)
                    # fold the activation scale into the weight column
                    # scales OUTSIDE the kernel: two (1, K) multiplies
                    x = fused_ln_geglu_residual_int8_static(
                        x.astype(self.dtype), s3, b3,
                        q["w1q"], q["s1"] * (ah / 127.0),
                        p["proj_in"]["bias"],
                        q["w2q"], q["s2"] * (ag / 127.0),
                        p["proj_out"]["bias"],
                        (127.0 / ah).reshape(1, 1),
                        (127.0 / ag).reshape(1, 1),
                    )
                else:
                    from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual_int8

                    x = fused_ln_geglu_residual_int8(
                        x.astype(self.dtype), s3, b3,
                        q["w1q"], q["s1"], p["proj_in"]["bias"],
                        q["w2q"], q["s2"], p["proj_out"]["bias"],
                    )
            else:
                from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual

                x = fused_ln_geglu_residual(
                    x.astype(self.dtype), s3, b3,
                    p["proj_in"]["kernel"], p["proj_in"]["bias"],
                    p["proj_out"]["kernel"], p["proj_out"]["bias"],
                )
        else:
            x = x + self.ff(self.norm3.apply_mod(x, s3, b3), deterministic=deterministic)
        return x

    def __call__(
        self,
        x: jax.Array,
        t_emb: jax.Array,
        cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        return self.apply_with_mods(x, self.mods(t_emb), cond, deterministic)


class LatentArrayTransformer(nn.Module):
    in_channels: int
    t_channels: int = 256
    n_heads: int = 8
    d_head: int = 64
    depth: int = 12
    out_channels: Optional[int] = None
    use_fused_ff: bool = False
    use_fused_attn: bool = False
    use_int8_ff: bool | str = False
    use_int8_attn: bool | str = False
    sow_quant_stats: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.n_heads * self.d_head
        out_ch = self.out_channels or self.in_channels
        self.map_noise = FourierTimeEmbedding(self.t_channels)
        self.map_layer0 = nn.Dense(inner, dtype=self.dtype)
        self.map_layer1 = nn.Dense(inner, dtype=self.dtype)
        self.proj_in = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.blocks = [
            LatentDiTBlock(
                n_heads=self.n_heads, d_head=self.d_head,
                use_fused_ff=self.use_fused_ff, use_fused_attn=self.use_fused_attn,
                use_int8_ff=self.use_int8_ff, use_int8_attn=self.use_int8_attn,
                sow_quant_stats=self.sow_quant_stats,
                dtype=self.dtype, name=f"block_{i}"
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # zero-init output projection (reference zero_module, :198-201)
        self.proj_out = nn.Dense(
            out_ch, use_bias=False, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )

    def compute_mods(self, t: jax.Array):
        """Noise embedding -> every block's AdaLN (scale, shift) pairs.

        Sigma-dependent only — hoistable out of the sampling loop: the Heun
        schedule's sigmas are fixed, so these 3*depth projections can be
        evaluated once per sampling call (see diffusion.edm.edm_sampler's
        ``denoise_indexed`` path) instead of at all 2*num_steps-1 NFEs.
        """
        t_emb = self.map_noise(t)[:, None, :]
        t_emb = jax.nn.silu(self.map_layer0(t_emb.astype(self.dtype)))
        t_emb = jax.nn.silu(self.map_layer1(t_emb))
        return tuple(block.mods(t_emb) for block in self.blocks)

    def forward_with_mods(
        self,
        x: jax.Array,
        mods,
        cond: Optional[jax.Array] = None,
        deterministic: bool = True,
        act_scales=None,
    ) -> jax.Array:
        """``act_scales``: per-block ``(ah, ag)`` FF activation scales for
        the static-int8 path (None anywhere falls back to dynamic)."""
        x = self.proj_in(x)
        if act_scales is None:
            act_scales = (None,) * len(self.blocks)
        for block, block_mods, sc in zip(self.blocks, mods, act_scales):
            x = block.apply_with_mods(x, block_mods, cond, deterministic, act_scales=sc)
        return self.proj_out(self.norm(x))

    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        return self.forward_with_mods(x, self.compute_mods(t), cond, deterministic)


class EDMPrecond(nn.Module):
    """EDM-preconditioned conditional denoiser over the latent token set."""

    n_latents: int = 512
    channels: int = 8
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 1.0
    n_heads: int = 8
    d_head: int = 64
    depth: int = 12
    # radar conditioning (reference :339-361)
    cond_type: str = "radar"
    use_radar_enc: bool = True
    unfreeze_radar_enc: bool = True
    radar_token_channel: int = 512
    input_radar_dims: tuple = (128, 8, 2)  # (R, A, E) of the raw cube
    enc_radar_dims: tuple = (8, 4, 2)  # (R', A', E') after the 3D-CNN encoder
    enc_radar_ch: int = 16
    enc_hidden_ch: int = 64
    use_fused_ff: bool = False
    use_fused_attn: bool = False
    use_int8_ff: bool | str = False
    use_int8_attn: bool | str = False
    sow_quant_stats: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = LatentArrayTransformer(
            in_channels=self.channels,
            t_channels=256,
            n_heads=self.n_heads,
            d_head=self.d_head,
            depth=self.depth,
            use_fused_ff=self.use_fused_ff,
            use_fused_attn=self.use_fused_attn,
            use_int8_ff=self.use_int8_ff,
            use_int8_attn=self.use_int8_attn,
            sow_quant_stats=self.sow_quant_stats,
            dtype=self.dtype,
        )
        if self.cond_type == "radar":
            if self.unfreeze_radar_enc:
                self.radar_enc = RadarEncoder3D(
                    ch=self.enc_hidden_ch, z_channels=self.enc_radar_ch, dtype=self.dtype
                )
            if self.use_radar_enc:
                r_dim, a_dim, e_dim = self.enc_radar_dims
                token_in_ch = self.enc_radar_ch
            else:
                r_dim, a_dim, e_dim = self.input_radar_dims
                token_in_ch = 1
            init = nn.initializers.normal(1.0)
            self.radar_r_emb = self.param("radar_r_emb", init, (r_dim, self.radar_token_channel))
            self.radar_a_emb = self.param("radar_a_emb", init, (a_dim, self.radar_token_channel))
            self.radar_e_emb = self.param("radar_e_emb", init, (e_dim, self.radar_token_channel))
            self.radar_token_project = nn.Dense(self.radar_token_channel, dtype=self.dtype)
            del token_in_ch  # input dim is inferred by flax at first call

    def process_radar_cond(self, radar_cube: jax.Array, deterministic: bool = True) -> jax.Array:
        """Radar conditioning -> (B, R*A*E, C) tokens (reference :363-407).

        ``radar_cube``: raw (B, R, A, E, ch>=1) cube when the in-graph encoder
        is used (or no encoder at all), else pre-encoded (B, R', A', E', z)
        tokens from a frozen external encoder.
        """
        if self.unfreeze_radar_enc:
            x = radar_cube[..., :1]  # intensity only (reference :378)
            x = self.radar_enc(x, deterministic)  # (B, R', A', E', z)
        elif not self.use_radar_enc:
            x = radar_cube[..., :1]
        else:
            x = radar_cube  # already encoded by a frozen external encoder

        tokens = self.radar_token_project(x.astype(self.dtype))
        tokens = (
            tokens
            + self.radar_r_emb[None, :, None, None, :]
            + self.radar_a_emb[None, None, :, None, :]
            + self.radar_e_emb[None, None, None, :, :]
        )
        b = tokens.shape[0]
        return tokens.reshape(b, -1, self.radar_token_channel)

    def denoise(
        self,
        x: jax.Array,
        sigma: jax.Array,
        cond_tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """EDM-preconditioned denoiser D(x; sigma) (reference forward, :412-430).

        ``cond_tokens`` must already be processed (``process_radar_cond``) —
        precompute them once per sampling loop.
        """
        x = x.astype(jnp.float32)
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1), (x.shape[0], 1, 1))

        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(sigma**2 + sd2)
        c_in = jax.lax.rsqrt(sd2 + sigma**2)
        c_noise = jnp.log(sigma) / 4

        f_x = self.model(
            (c_in * x).astype(self.dtype),
            c_noise.reshape(-1),
            cond=cond_tokens,
            deterministic=deterministic,
        )
        return c_skip * x + c_out * f_x.astype(jnp.float32)

    def compute_mod_table(self, sigmas: jax.Array):
        """AdaLN (scale, shift) pairs for a fixed sigma schedule.

        ``sigmas``: (S,) noise levels. Leaves are (S, 1, inner) — index with
        the schedule step to modulate a whole batch (every sample in a
        sampling batch shares the step's sigma). Hoists 3*depth tiny
        projections out of the 2*num_steps-1 NFE loop.
        """
        c_noise = jnp.log(jnp.asarray(sigmas, jnp.float32)) / 4
        return self.model.compute_mods(c_noise)

    def denoise_with_mods(
        self,
        x: jax.Array,
        sigma: jax.Array,
        mods,
        cond_tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
        act_scales=None,
    ) -> jax.Array:
        """``denoise`` with precomputed AdaLN modulations for this sigma.

        ``act_scales``: per-block ``(ah, ag)`` FF activation scales for this
        sigma's schedule step (static-int8 path; see
        ``GenerationEngine.calibrate_act_scales``)."""
        x = x.astype(jnp.float32)
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1), (x.shape[0], 1, 1))
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(sigma**2 + sd2)
        c_in = jax.lax.rsqrt(sd2 + sigma**2)
        f_x = self.model.forward_with_mods(
            (c_in * x).astype(self.dtype), mods, cond_tokens, deterministic,
            act_scales=act_scales,
        )
        return c_skip * x + c_out * f_x.astype(jnp.float32)

    def __call__(
        self,
        x: jax.Array,
        sigma: jax.Array,
        radar_cube: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cond = (
            self.process_radar_cond(radar_cube, deterministic)
            if (self.cond_type == "radar" and radar_cube is not None)
            else None
        )
        return self.denoise(x, sigma, cond, deterministic)
