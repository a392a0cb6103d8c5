"""Name-keyed model factories.

Mirrors the reference's ``module.__dict__[name](...)`` factory surface
(``main_ae.py:102``, ``main_generation.py:122,134``) with the same variant
names, so configs are interchangeable.
"""
from __future__ import annotations

import jax.numpy as jnp

from rald_tpu.models.latent_dit import EDMPrecond
from rald_tpu.models.radar_encoder3d import RadarAutoencoder, create_radar_autoencoder
from rald_tpu.models.vecset_vae import VecSetVAE, create_autoencoder

Dtype = jnp.dtype


def _ae_variants():
    """Reference models_ae.py:461-512."""
    out = {}
    for l in (512, 64, 32, 16, 8, 4, 2, 1):
        out[f"kl_d512_m512_l{l}"] = dict(dim=512, M=512, latent_dim=l, query_type="point")
    out["kl_d512_m512_l32_learn"] = dict(dim=512, M=512, latent_dim=32, query_type="learnable")
    out["kl_d512_m512_l32_mix"] = dict(dim=512, M=512, latent_dim=32, query_type="mix")
    for m in (512, 256, 128, 64):
        out[f"ae_d512_m{m}"] = dict(dim=512, M=m, deterministic=True)
    for d in (256, 128, 64):
        out[f"ae_d{d}_m512"] = dict(dim=d, M=512, deterministic=True)
    return out


AE_VARIANTS = _ae_variants()

# reference models_radar_generation.py:452-482
GENERATION_VARIANTS = {
    "kl_d512_m512_l8_edm": dict(channels=8, depth=12),
    "kl_d512_m512_l16_edm": dict(channels=16, depth=12),
    "kl_d512_m512_l32_edm": dict(channels=32, depth=12),
    "kl_d512_m512_l4_d24_edm": dict(channels=4, depth=24),
    "kl_d512_m512_l8_d24_edm": dict(channels=8, depth=24),
    "kl_d512_m512_l32_d24_edm": dict(channels=32, depth=24),
    "kl_d512_m512_l32_d18_edm": dict(channels=32, depth=18),
    "kl_d512_m512_l32_d12_edm": dict(channels=32, depth=12),
}

# reference models_radar_encoder.py:423-446
RADAR_ENCODER_VARIANTS = {
    "ae_ch128_mult5_n2_d16": dict(basic_channel=128, embed_dim=16),
    "ae_ch64_mult5_n2_d16": dict(basic_channel=64, embed_dim=16),
    "ae_ch16_mult5_n2_d16": dict(basic_channel=16, embed_dim=16),
}


def get_ae_model(
    name: str,
    N: int = 2048,
    dtype: Dtype = jnp.float32,
    use_fused_ff: bool = False,
    fold_decode_tail: bool = False,
) -> VecSetVAE:
    kw = dict(AE_VARIANTS[name])
    return create_autoencoder(
        N=N, dtype=dtype, use_fused_ff=use_fused_ff,
        fold_decode_tail=fold_decode_tail, **kw
    )


def get_generation_model(
    name: str, configs, dtype: Dtype = jnp.float32,
    use_fused_ff: bool = False, use_fused_attn: bool = False,
) -> EDMPrecond:
    """Build an EDM model from an ``ar_model.configs`` block (reference yml surface)."""
    kw = GENERATION_VARIANTS[name]
    return EDMPrecond(
        n_latents=512,
        channels=kw["channels"],
        depth=kw["depth"],
        cond_type=configs.get("cond_type", "radar"),
        use_radar_enc=configs.get("use_radar_enc", True),
        unfreeze_radar_enc=configs.get("unfreeze_radar_enc", False),
        radar_token_channel=configs.get("radar_token_channel", 512),
        input_radar_dims=(
            configs.get("input_radar_r_dim", 128),
            configs.get("input_radar_a_dim", 8),
            configs.get("input_radar_e_dim", 2),
        ),
        enc_radar_dims=(
            configs.get("enc_radar_r_dim", 8),
            configs.get("enc_radar_a_dim", 4),
            configs.get("enc_radar_e_dim", 2),
        ),
        enc_radar_ch=configs.get("enc_radar_ch", 16),
        enc_hidden_ch=configs.get("enc_hidden_ch", 64),
        use_fused_ff=use_fused_ff,
        use_fused_attn=use_fused_attn,
        dtype=dtype,
    )


def get_radar_encoder_model(
    name: str, in_channels: int = 2, dtype: Dtype = jnp.float32
) -> RadarAutoencoder:
    kw = RADAR_ENCODER_VARIANTS[name]
    return create_radar_autoencoder(in_channels=in_channels, dtype=dtype, **kw)
