"""Radar-cube 3D-CNN autoencoder (VQGAN-style), TPU-native.

Capability parity with ``model/models_radar_encoder.py`` (:137-241 Encoder,
:243-364 Decoder, :366-406 RadarAutoencoder): a 5-level (ch_mult 1,1,2,2,4)
3D conv encoder over (R, A, E) radar cubes — (128, 64, 32) -> (8, 4, 2),
``z_channels`` latent channels — with GroupNorm(32, eps 1e-6) + swish
ResNet blocks, full self-attention at the deepest resolution, and the mirror
decoder.

TPU notes: everything is channel-last (NDHWC) — XLA's native conv layout —
so the reference's NCDHW permute shims (``_encode``, :390-393; ``forward``,
:400-405) disappear: cubes flow as (B, R, A, E, C) end to end. Downsampling
keeps the reference's asymmetric pad-then-stride-2 conv (pad (0,1) per
spatial dim, :37-41) for exact shape/math parity.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _num_groups(channels: int) -> int:
    """32 groups (reference Normalize, :9-12) for all real configs (channels
    are multiples of 32 there); gcd fallback keeps tiny test configs valid."""
    import math

    return math.gcd(32, channels)


class ResnetBlock3D(nn.Module):
    out_channels: int | None = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = nn.GroupNorm(num_groups=_num_groups(in_ch), epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = _swish(h)
        h = nn.Conv(out_ch, (3, 3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_num_groups(out_ch), epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = _swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock3D(nn.Module):
    """Full self-attention over flattened (R, A, E) cells
    (reference :102-135; runs at (8, 4, 2) -> 64 tokens)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, r, a, e, c = x.shape
        h = nn.GroupNorm(num_groups=_num_groups(c), epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="q")(h).reshape(b, -1, c)
        k = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="k")(h).reshape(b, -1, c)
        v = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="v")(h).reshape(b, -1, c)
        sim = jnp.einsum("bqc,bkc->bqk", q, k) * (c**-0.5)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, r, a, e, c)
        out = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample3D(nn.Module):
    """Pad (0,1) per spatial dim then stride-2 valid conv (reference :29-44)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3, 3), strides=(2, 2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class Upsample3D(nn.Module):
    """Nearest x2 then conv (reference :14-27)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, r, a, e, c = x.shape
        x = jax.image.resize(x, (b, 2 * r, 2 * a, 2 * e, c), method="nearest")
        return nn.Conv(c, (3, 3, 3), dtype=self.dtype, name="conv")(x)


class RadarEncoder3D(nn.Module):
    """(B, R, A, E, C_in) -> (B, R/16, A/16, E/16, z_channels) (reference :137-241)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[Tuple[int, int, int], ...] = ((8, 4, 2),)
    resolution: Tuple[int, int, int] = (128, 64, 32)
    dropout: float = 0.0
    z_channels: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.ch, (3, 3, 3), dtype=self.dtype, name="conv_in")(x)
        num_levels = len(self.ch_mult)
        # attn insertion follows the CONFIGURED resolution's halving schedule,
        # not the actual tensor shape (reference :165-183 tracks curr_res from
        # the `resolution` ctor arg) — so the module structure is independent
        # of the input size, matching reference checkpoints exactly.
        curr_res = tuple(self.resolution)
        for i_level in range(num_levels):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock3D(
                    out_channels=self.ch * self.ch_mult[i_level],
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock3D(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample3D(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res = tuple(int(r / 2) for r in curr_res)

        h = ResnetBlock3D(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h, deterministic)
        h = AttnBlock3D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock3D(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h, deterministic)

        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = _swish(h)
        return nn.Conv(self.z_channels, (3, 3, 3), dtype=self.dtype, name="conv_out")(h)


class RadarDecoder3D(nn.Module):
    """Mirror decoder (reference :243-364)."""

    ch: int = 128
    out_ch: int = 2
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3, 3), dtype=self.dtype, name="conv_in")(z)

        h = ResnetBlock3D(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h, deterministic)
        h = AttnBlock3D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock3D(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h, deterministic)

        for i_level in reversed(range(num_levels)):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock3D(
                    out_channels=self.ch * self.ch_mult[i_level],
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic)
            if i_level != 0:
                h = Upsample3D(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)

        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = _swish(h)
        return nn.Conv(self.out_ch, (3, 3, 3), dtype=self.dtype, name="conv_out")(h)


class RadarAutoencoder(nn.Module):
    """Encoder + decoder pair (reference :366-406); channel-last throughout,
    so ``_encode``'s permute shim is unnecessary — pass (B, R, A, E, C)."""

    basic_channel: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    embed_dim: int = 16
    in_channels: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = RadarEncoder3D(
            ch=self.basic_channel,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            z_channels=self.embed_dim,
            dtype=self.dtype,
        )
        self.decoder = RadarDecoder3D(
            ch=self.basic_channel,
            out_ch=self.in_channels,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            dtype=self.dtype,
        )

    def encode(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.encoder(x, deterministic)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.decoder(z, deterministic)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> dict:
        z = self.encode(x, deterministic)
        return {"pred": self.decode(z, deterministic), "latent": z}


def create_radar_autoencoder(
    basic_channel: int = 128,
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4),
    num_res_blocks: int = 2,
    embed_dim: int = 16,
    in_channels: int = 2,
    dtype: Dtype = jnp.float32,
) -> RadarAutoencoder:
    """Factory matching reference ``create_autoencoder`` (models_radar_encoder.py:408-420)."""
    return RadarAutoencoder(
        basic_channel=basic_channel,
        ch_mult=ch_mult,
        num_res_blocks=num_res_blocks,
        embed_dim=embed_dim,
        in_channels=in_channels,
        dtype=dtype,
    )
