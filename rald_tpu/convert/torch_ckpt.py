"""PyTorch -> JAX checkpoint conversion for the reference RaLD models.

The released RaLD checkpoints (reference README.md:62-63) are torch
``state_dict``s of ``KLAutoEncoder`` (model/models_ae.py:284),
``EDMPrecond`` (model/models_radar_generation.py:314) and
``RadarAutoencoder`` (model/models_radar_encoder.py:366). This module maps
them onto our flax param trees so released weights are the correctness
oracle for the TPU rebuild (SURVEY.md §7 "Checkpoint parity").

Layout transforms:
- ``nn.Linear``    weight (out, in)            -> Dense kernel (in, out)
- ``nn.Conv3d``    weight (out, in, D, H, W)   -> flax Conv kernel (D, H, W, in, out)
- ``nn.LayerNorm`` weight/bias                 -> scale/bias
- ``nn.GroupNorm`` weight/bias                 -> scale/bias
- ``nn.Embedding`` weight                      -> raw param
- the VAE's fused ``to_kv`` stays fused (our Attention keeps that layout);
  the DiT's split ``to_k``/``to_v`` stay split.

Inputs are dicts of numpy arrays (or torch tensors — converted lazily so
torch is an optional dependency).
"""
from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def load_torch_checkpoint(path: str | Path, key: str | None = "model") -> dict:
    """Load a torch .pth checkpoint into a numpy state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[key] if key and key in ckpt else ckpt
    return {k: _np(v) for k, v in sd.items()}


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _groupnorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv3d(sd: Mapping, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # (out, in, D, H, W)
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _attention(sd: Mapping, prefix: str, fused_kv: bool) -> dict:
    """Reference Attention (models_ae.py:70) / CrossAttention
    (models_radar_generation.py:35) -> our nn.layers.Attention params."""
    out = {"to_q": _linear(sd, f"{prefix}.to_q", bias=False)}
    if fused_kv:
        out["to_kv"] = _linear(sd, f"{prefix}.to_kv", bias=False)
    else:
        out["to_k"] = _linear(sd, f"{prefix}.to_k", bias=False)
        out["to_v"] = _linear(sd, f"{prefix}.to_v", bias=False)
    # DiT wraps to_out in Sequential(Linear, Dropout) -> '.to_out.0'
    to_out_key = f"{prefix}.to_out.0" if f"{prefix}.to_out.0.weight" in sd else f"{prefix}.to_out"
    out["to_out"] = _linear(sd, to_out_key)
    return out


def _geglu_ff(sd: Mapping, prefix: str, dit_style: bool) -> dict:
    """VAE FeedForward (net.0 Linear -> GEGLU -> net.2 Linear, models_ae.py:56)
    or DiT FeedForward (net.0.proj GEGLU Linear -> net.2, :98-117)."""
    proj_in_key = f"{prefix}.net.0.proj" if dit_style else f"{prefix}.net.0"
    return {
        "proj_in": _linear(sd, proj_in_key),
        "proj_out": _linear(sd, f"{prefix}.net.2"),
    }


# --------------------------------------------------------------------- VAE


def convert_vae_state_dict(sd: Mapping, depth: int = 24, query_type: str = "mix") -> dict:
    """KLAutoEncoder state_dict -> VecSetVAE params (models_ae.py:284-433)."""
    p: dict = {}
    p["point_embed"] = {"mlp": _linear(sd, "point_embed.mlp")}

    # encoder cross block: cross_attend_blocks.0 = PreNorm(attn, context),
    # cross_attend_blocks.1 = PreNorm(ff)  (models_ae.py:308-311)
    p["enc_norm_q"] = _layernorm(sd, "cross_attend_blocks.0.norm")
    p["enc_norm_ctx"] = _layernorm(sd, "cross_attend_blocks.0.norm_context")
    p["enc_cross_attn"] = _attention(sd, "cross_attend_blocks.0.fn", fused_kv=True)
    p["enc_ff_norm"] = _layernorm(sd, "cross_attend_blocks.1.norm")
    p["enc_ff"] = _geglu_ff(sd, "cross_attend_blocks.1.fn", dit_style=False)

    if query_type == "learnable":
        p["latent_query"] = _np(sd["latents.weight"])
    elif query_type == "mix":
        p["s_latents"] = _np(sd["s_latents.weight"])
        p["d_latents"] = _np(sd["d_latents.weight"])
        p["mix_norm"] = _layernorm(sd, "mix_attn_layer.norm")
        p["mix_attn"] = _attention(sd, "mix_attn_layer.fn", fused_kv=True)
        p["query_proj"] = _linear(sd, "query_proj")

    for i in range(depth):
        p[f"block_{i}"] = {
            "attn_norm": _layernorm(sd, f"layers.{i}.0.norm"),
            "attn": _attention(sd, f"layers.{i}.0.fn", fused_kv=True),
            "ff_norm": _layernorm(sd, f"layers.{i}.1.norm"),
            "ff": _geglu_ff(sd, f"layers.{i}.1.fn", dit_style=False),
        }

    p["dec_norm_q"] = _layernorm(sd, "decoder_cross_attn.norm")
    p["dec_norm_ctx"] = _layernorm(sd, "decoder_cross_attn.norm_context")
    p["dec_cross_attn"] = _attention(sd, "decoder_cross_attn.fn", fused_kv=True)
    p["to_outputs"] = _linear(sd, "to_outputs")
    if "proj.weight" in sd:
        p["proj"] = _linear(sd, "proj")
        p["mean_fc"] = _linear(sd, "mean_fc")
        p["logvar_fc"] = _linear(sd, "logvar_fc")
    return p


# --------------------------------------------------------------- radar CNN


def _resnet_block(sd: Mapping, prefix: str) -> dict:
    out = {
        "norm1": _groupnorm(sd, f"{prefix}.norm1"),
        "conv1": _conv3d(sd, f"{prefix}.conv1"),
        "norm2": _groupnorm(sd, f"{prefix}.norm2"),
        "conv2": _conv3d(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv3d(sd, f"{prefix}.nin_shortcut")
    return out


def _attn_block3d(sd: Mapping, prefix: str) -> dict:
    return {
        "norm": _groupnorm(sd, f"{prefix}.norm"),
        "q": _conv3d(sd, f"{prefix}.q"),
        "k": _conv3d(sd, f"{prefix}.k"),
        "v": _conv3d(sd, f"{prefix}.v"),
        "proj_out": _conv3d(sd, f"{prefix}.proj_out"),
    }


def convert_radar_encoder_state_dict(
    sd: Mapping,
    prefix: str = "",
    num_levels: int = 5,
    num_res_blocks: int = 2,
) -> dict:
    """Encoder state_dict -> RadarEncoder3D params (models_radar_encoder.py:137-241)."""
    g = lambda name: f"{prefix}{name}" if prefix else name
    p: dict = {"conv_in": _conv3d(sd, g("conv_in"))}
    for i in range(num_levels):
        for j in range(num_res_blocks):
            p[f"down_{i}_block_{j}"] = _resnet_block(sd, g(f"down.{i}.block.{j}"))
            if f"{g(f'down.{i}.attn.{j}')}.norm.weight" in sd:
                p[f"down_{i}_attn_{j}"] = _attn_block3d(sd, g(f"down.{i}.attn.{j}"))
        if f"{g(f'down.{i}.downsample.conv')}.weight" in sd:
            p[f"down_{i}_downsample"] = {"conv": _conv3d(sd, g(f"down.{i}.downsample.conv"))}
    p["mid_block_1"] = _resnet_block(sd, g("mid.block_1"))
    p["mid_attn_1"] = _attn_block3d(sd, g("mid.attn_1"))
    p["mid_block_2"] = _resnet_block(sd, g("mid.block_2"))
    p["norm_out"] = _groupnorm(sd, g("norm_out"))
    p["conv_out"] = _conv3d(sd, g("conv_out"))
    return p


def convert_radar_decoder_state_dict(
    sd: Mapping,
    prefix: str = "",
    num_levels: int = 5,
    num_res_blocks: int = 2,
) -> dict:
    """Decoder state_dict -> RadarDecoder3D params (models_radar_encoder.py:243-364)."""
    g = lambda name: f"{prefix}{name}" if prefix else name
    p: dict = {"conv_in": _conv3d(sd, g("conv_in"))}
    p["mid_block_1"] = _resnet_block(sd, g("mid.block_1"))
    p["mid_attn_1"] = _attn_block3d(sd, g("mid.attn_1"))
    p["mid_block_2"] = _resnet_block(sd, g("mid.block_2"))
    for i in range(num_levels):
        for j in range(num_res_blocks + 1):
            p[f"up_{i}_block_{j}"] = _resnet_block(sd, g(f"up.{i}.block.{j}"))
        if f"{g(f'up.{i}.upsample.conv')}.weight" in sd:
            p[f"up_{i}_upsample"] = {"conv": _conv3d(sd, g(f"up.{i}.upsample.conv"))}
    p["norm_out"] = _groupnorm(sd, g("norm_out"))
    p["conv_out"] = _conv3d(sd, g("conv_out"))
    return p


def convert_radar_autoencoder_state_dict(sd: Mapping, **kw) -> dict:
    """RadarAutoencoder (encoder + decoder) state_dict -> our params."""
    return {
        "encoder": convert_radar_encoder_state_dict(sd, prefix="encoder.", **kw),
        "decoder": convert_radar_decoder_state_dict(sd, prefix="decoder.", **kw),
    }


# --------------------------------------------------------------------- DiT


def convert_edm_state_dict(sd: Mapping, depth: int = 24) -> dict:
    """EDMPrecond state_dict -> our EDMPrecond params
    (models_radar_generation.py:314-449)."""
    m: dict = {
        "proj_in": _linear(sd, "model.proj_in", bias=False),
        "proj_out": _linear(sd, "model.proj_out", bias=False),
        "norm": _layernorm(sd, "model.norm"),
        "map_layer0": _linear(sd, "model.map_layer0"),
        "map_layer1": _linear(sd, "model.map_layer1"),
    }
    for i in range(depth):
        b = f"model.transformer_blocks.{i}"
        m[f"block_{i}"] = {
            "norm1": {"mod": _linear(sd, f"{b}.norm1.linear")},
            "attn1": _attention(sd, f"{b}.attn1", fused_kv=False),
            "norm2": {"mod": _linear(sd, f"{b}.norm2.linear")},
            "attn2": _attention(sd, f"{b}.attn2", fused_kv=False),
            "norm3": {"mod": _linear(sd, f"{b}.norm3.linear")},
            "ff": _geglu_ff(sd, f"{b}.ff", dit_style=True),
        }
    p: dict = {"model": m}

    if "radar_token_project.weight" in sd:
        p["radar_token_project"] = _linear(sd, "radar_token_project")
        p["radar_r_emb"] = _np(sd["radar_r_emb.weight"])
        p["radar_a_emb"] = _np(sd["radar_a_emb.weight"])
        p["radar_e_emb"] = _np(sd["radar_e_emb.weight"])
    if "radar_enc.conv_in.weight" in sd:
        p["radar_enc"] = convert_radar_encoder_state_dict(sd, prefix="radar_enc.")
    return p
