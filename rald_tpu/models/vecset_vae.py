"""Stage-1 point-cloud VAE (3DShape2VecSet-style), TPU-native.

Capability parity with ``model/models_ae.py:284-433`` (``KLAutoEncoder``) and
:181-283 (deterministic ``AutoEncoder``): encodes N surface points into M
latent tokens (KL-regularized, ``latent_dim`` channels each) and decodes
occupancy logits at arbitrary 3D query points.

Architecture (identical math, TPU-first execution):

- encode: PointEmbed over the cloud; latent queries from FPS points
  (``query_type='point'``), a learned embedding table (``'learnable'``), or
  the static+dynamic mix (``'mix'``, reference :380-387); one 1-head
  cross-attention (M queries x N keys) + GEGLU FF; mean/logvar heads;
  reparameterized sample (reference :392-405).
- decode: project ``latent_dim -> dim``; ``depth`` pre-norm self-attention
  blocks over the M tokens; 1-head cross-attention from query-point
  embeddings to the tokens; linear occupancy head (reference :408-424).

TPU notes:
- FPS is the ``lax.fori_loop`` kernel in :mod:`rald_tpu.ops.fps` (the
  primary configs use 'mix' queries, which avoid FPS entirely).
- ``decode`` streams the query axis in chunks under ``lax.map``
  (:mod:`rald_tpu.ops.query_attention`) so the ~0.5-1.2M-query inference
  path (engine_generation.py:250-310) runs in one jit with O(chunk) live
  memory instead of materializing (Q, M) score tensors in HBM.
- compute dtype is configurable (bf16 keeps the MXU busy; LayerNorm/softmax
  statistics stay f32 inside the primitives).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rald_tpu.nn.layers import Attention, GEGLUFeedForward, PointEmbed
from rald_tpu.ops.fps import fps_points
from rald_tpu.ops.query_attention import map_query_chunks

Dtype = jnp.dtype


class SelfAttnBlock(nn.Module):
    """Pre-norm self-attention + pre-norm GEGLU FF, both residual
    (reference models_ae.py:412-414 loop body)."""

    heads: int = 8
    dim_head: int = 64
    drop_path_rate: float = 0.1
    use_fused_ff: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="attn_norm")(x)
        x = x + Attention(
            heads=self.heads,
            dim_head=self.dim_head,
            drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        if self.use_fused_ff and deterministic and not self.is_initializing():
            # whole FF sublayer (LN + GEGLU FF + residual) in one
            # VMEM-resident Pallas kernel (rald_tpu.ops.geglu_kernel); the
            # unfused branch below created these params at init
            from rald_tpu.ops.geglu_kernel import fused_ln_geglu_residual

            p = self.variables["params"]
            ln, ff = p["ff_norm"], p["ff"]
            x = fused_ln_geglu_residual(
                x.astype(self.dtype),
                ln["scale"][None, None], ln["bias"][None, None],
                ff["proj_in"]["kernel"], ff["proj_in"]["bias"],
                ff["proj_out"]["kernel"], ff["proj_out"]["bias"],
                scale_shift_mod=False,
            )
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ff_norm")(x)
            x = x + GEGLUFeedForward(
                drop_path_rate=self.drop_path_rate, use_fused=self.use_fused_ff,
                dtype=self.dtype, name="ff"
            )(h, deterministic=deterministic)
        return x


class VecSetVAE(nn.Module):
    depth: int = 24
    dim: int = 512
    queries_dim: int = 512
    output_dim: int = 1
    num_inputs: int = 2048
    num_latents: int = 512
    latent_dim: int = 32
    heads: int = 8
    dim_head: int = 64
    query_type: str = "mix"  # 'point' | 'learnable' | 'mix'
    deterministic_latent: bool = False  # reference AutoEncoder (models_ae.py:181)
    query_chunk: int = 65536
    use_fused_ff: bool = False  # Pallas fused GEGLU FF in the self-attn stack (TPU inference)
    fold_decode_tail: bool = False  # fold values/out-proj/occupancy head (inference)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.point_embed = PointEmbed(dim=self.dim, dtype=self.dtype)

        # encoder cross-attention (1 head, dim_head = dim; reference :308-311)
        self.enc_norm_q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.enc_norm_ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.enc_cross_attn = Attention(heads=1, dim_head=self.dim, dtype=self.dtype)
        self.enc_ff_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.enc_ff = GEGLUFeedForward(dtype=self.dtype)

        if self.query_type == "learnable":
            self.latent_query = self.param(
                "latent_query", nn.initializers.normal(1.0), (self.num_latents, self.dim)
            )
        elif self.query_type == "mix":
            self.s_latents = self.param(
                "s_latents", nn.initializers.normal(1.0), (self.num_latents, self.dim)
            )
            self.d_latents = self.param(
                "d_latents", nn.initializers.normal(1.0), (self.num_latents, self.dim)
            )
            # reference :330: a latent-attn instance (LN on query only, no residual)
            self.mix_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
            self.mix_attn = Attention(
                heads=self.heads, dim_head=self.dim_head, drop_path_rate=0.1, dtype=self.dtype
            )
            self.query_proj = nn.Dense(self.dim, dtype=self.dtype)
        elif self.query_type != "point":
            raise NotImplementedError(f"Query type {self.query_type} is not implemented")

        self.blocks = [
            SelfAttnBlock(
                heads=self.heads, dim_head=self.dim_head,
                use_fused_ff=self.use_fused_ff, dtype=self.dtype, name=f"block_{i}"
            )
            for i in range(self.depth)
        ]

        # decoder cross-attention (1 head; LN on queries and context; :341)
        self.dec_norm_q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dec_norm_ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dec_cross_attn = Attention(
            heads=1, dim_head=self.queries_dim, out_dim=self.queries_dim, dtype=self.dtype
        )
        self.to_outputs = nn.Dense(self.output_dim, dtype=self.dtype)

        if not self.deterministic_latent:
            self.proj = nn.Dense(self.dim, dtype=self.dtype)
            self.mean_fc = nn.Dense(self.latent_dim, dtype=self.dtype)
            self.logvar_fc = nn.Dense(self.latent_dim, dtype=self.dtype)

    def _latent_queries(self, pc: jax.Array, pc_embeddings: jax.Array, deterministic: bool):
        b = pc.shape[0]
        if self.query_type == "point":
            sampled = fps_points(pc, self.num_latents)
            return self.point_embed(sampled)
        if self.query_type == "learnable":
            return jnp.broadcast_to(self.latent_query, (b, self.num_latents, self.dim)).astype(self.dtype)
        # 'mix' (reference :380-387): dynamic queries attend to the cloud,
        # static table added, joint projection; context is NOT pre-normed.
        static_q = jnp.broadcast_to(self.s_latents, (b, self.num_latents, self.dim)).astype(self.dtype)
        dynamic_q = jnp.broadcast_to(self.d_latents, (b, self.num_latents, self.dim)).astype(self.dtype)
        dynamic_q = self.mix_attn(
            self.mix_norm(dynamic_q), context=pc_embeddings, deterministic=deterministic
        )
        return self.query_proj(static_q + dynamic_q)

    def encode(
        self,
        pc: jax.Array,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
        deterministic: bool = True,
    ):
        """(B, N, 3) -> (kl, z) with z (B, M, latent_dim) (reference :351-405)."""
        assert pc.shape[1] == self.num_inputs, (pc.shape, self.num_inputs)
        pc_embeddings = self.point_embed(pc)
        x = self._latent_queries(pc, pc_embeddings, deterministic)

        x = x + self.enc_cross_attn(
            self.enc_norm_q(x), context=self.enc_norm_ctx(pc_embeddings), deterministic=deterministic
        )
        x = x + self.enc_ff(self.enc_ff_norm(x), deterministic=deterministic)

        if self.deterministic_latent:
            return jnp.zeros((pc.shape[0],), jnp.float32), x

        mean = self.mean_fc(x).astype(jnp.float32)
        logvar = jnp.clip(self.logvar_fc(x).astype(jnp.float32), -30.0, 20.0)
        var = jnp.exp(logvar)
        kl = 0.5 * jnp.mean(mean**2 + var - 1.0 - logvar, axis=(1, 2))
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("latent")
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return kl, z.astype(self.dtype)

    def decode_latents(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """Latent tokens -> decoder token state (proj + self-attn stack, :410-414)."""
        x = z.astype(self.dtype)
        if not self.deterministic_latent:
            x = self.proj(x)
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        return x

    def decode_queries(self, tokens: jax.Array, queries: jax.Array) -> jax.Array:
        """Occupancy logits at query points given decoder tokens (:417-424).

        Streams the query axis in ``query_chunk`` blocks: each chunk runs
        point-embed -> LN -> cross-attend (KV precomputed once) -> head.

        With ``fold_decode_tail`` everything after the softmax collapses: the
        occupancy head is linear, so ``((attn @ V) W_out + b_out) W_head + b``
        == ``attn @ (V W_out W_head) + (b_out W_head + b)`` with a per-call
        (M, 1) folded value vector — dropping the two (B, chunk, dim) value /
        out-proj matmuls (~45% of decode FLOPs) and their HBM round-trips.
        Identical math to the reference chain (models_ae.py:417-424), just
        reassociated; enable for inference.
        """
        ctx = self.dec_norm_ctx(tokens)

        if self.fold_decode_tail and not self.is_initializing() and self.output_dim == 1:
            return self._decode_queries_folded(ctx, queries)

        def tail(q_blk: jax.Array) -> jax.Array:
            q_emb = self.dec_norm_q(self.point_embed(q_blk))
            out = self.dec_cross_attn(q_emb, context=ctx)
            return self.to_outputs(out)

        if self.is_initializing():
            return tail(queries)
        return map_query_chunks(tail, queries, self._chunk(queries.shape[0]))

    def _chunk(self, batch: int) -> int:
        """Per-chunk query count, scaled so batch * chunk stays ~constant.

        A fixed chunk regresses at large batch: the per-chunk (B, chunk, dim)
        intermediates grow with B and spill (measured: batch 32 was ~15%
        slower per frame than batch 8 with chunk 65536). Cap the row budget
        at 2^19 rows per dispatch instead.
        """
        return max(4096, min(self.query_chunk, (1 << 19) // max(1, batch)))

    def _decode_queries_folded(self, ctx: jax.Array, queries: jax.Array) -> jax.Array:
        p = self.variables["params"]
        ca = p["dec_cross_attn"]
        wq = ca["to_q"]["kernel"]
        wk, wv = jnp.split(ca["to_kv"]["kernel"], 2, axis=-1)
        wo, bo = ca["to_out"]["kernel"], ca["to_out"]["bias"]
        wh, bh = p["to_outputs"]["kernel"], p["to_outputs"]["bias"]
        w_tail = wo.astype(jnp.float32) @ wh.astype(jnp.float32)  # (dim, 1)
        bias = bo.astype(jnp.float32) @ wh.astype(jnp.float32) + bh.astype(jnp.float32)

        k = ctx @ wk.astype(self.dtype)  # (B, M, dim)
        v = ctx @ wv.astype(self.dtype)
        v_fold = v.astype(jnp.float32) @ w_tail  # (B, M, 1)

        scale = float(self.queries_dim) ** -0.5

        # query-side fold (same reassociation trick as the value fold, on the
        # other side of the softmax): to_q is bias-free and the cross-attn is
        # 1-head, so ``softmax((q_emb Wq) K^T * s) == softmax(q_emb (Wq K^T s))``
        # with a per-frame (dim, M) folded score weight. The per-query MXU
        # work drops from two (rows, dim) matmuls (q-proj + scores) to one —
        # ~45% of the post-value-fold decode FLOPs.
        w_score = jnp.einsum(
            "di,bmi->bdm", wq.astype(jnp.float32) * scale, k.astype(jnp.float32)
        ).astype(self.dtype)  # (B, dim, M)

        # fold the softmax denominator into the matvec: append a ones column
        # to the folded values so one (M, 2) matvec yields numerator and
        # denominator — the normalized (B, chunk, M) attention tensor is
        # never formed (measured ~10% off the decode-chunk time vs
        # jax.nn.softmax + separate matvec)
        v2 = jnp.concatenate(
            [v_fold.astype(jnp.float32), jnp.ones_like(v_fold, jnp.float32)], axis=-1
        )  # (B, M, 2)

        def tail(q_blk: jax.Array) -> jax.Array:
            q_emb = self.dec_norm_q(self.point_embed(q_blk))
            sim = jnp.einsum("bqd,bdm->bqm", q_emb, w_score).astype(jnp.float32)
            # constant-shift exp instead of the row-max softmax shift: the
            # numerator/denominator RATIO is invariant to any fixed shift, so
            # skipping the per-row max reduction is exact as long as exp
            # neither overflows nor flushes to zero — guaranteed by the clip
            # ([-45, 80] logits -> exp range [1.2e-37, 2.4e17], all normal
            # f32; trained decoder logits sit well inside). Measured ~0.8
            # ms/chunk off the decode (the row-max was a second pass over
            # the (B, chunk, M) scores).
            e = jnp.exp(jnp.clip(sim, -45.0, 80.0) - 40.0)
            nd = jnp.einsum("bqm,bmo->bqo", e, v2)
            return nd[..., :1] / nd[..., 1:] + bias

        return map_query_chunks(tail, queries, self._chunk(queries.shape[0]))

    def decode(self, z: jax.Array, queries: jax.Array, deterministic: bool = True) -> jax.Array:
        tokens = self.decode_latents(z, deterministic=deterministic)
        return self.decode_queries(tokens, queries)

    def __call__(
        self,
        pc: jax.Array,
        queries: jax.Array,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
        deterministic: bool = True,
    ) -> dict:
        kl, z = self.encode(
            pc, rng=rng, sample_posterior=sample_posterior, deterministic=deterministic
        )
        logits = self.decode(z, queries, deterministic=deterministic)
        return {"logits": jnp.squeeze(logits, -1).astype(jnp.float32), "kl": kl}


def create_autoencoder(
    dim: int = 512,
    M: int = 512,
    latent_dim: int = 64,
    N: int = 2048,
    deterministic: bool = False,
    query_type: str = "point",
    use_fused_ff: bool = False,
    fold_decode_tail: bool = False,
    dtype: Dtype = jnp.float32,
) -> VecSetVAE:
    """Factory matching reference ``create_autoencoder`` (models_ae.py:434-459)."""
    return VecSetVAE(
        depth=24,
        dim=dim,
        queries_dim=dim,
        output_dim=1,
        num_inputs=N,
        num_latents=M,
        latent_dim=latent_dim,
        heads=8,
        dim_head=64,
        query_type=query_type,
        deterministic_latent=deterministic,
        use_fused_ff=use_fused_ff,
        fold_decode_tail=fold_decode_tail,
        dtype=dtype,
    )
