"""Checkpoint-conversion parity: torch oracles vs converted flax params.

The released RaLD checkpoints are unavailable offline, so these tests build
small torch models that reproduce the reference architectures *exactly*
(module names AND math — prenorm placement, GEGLU chunk order, AdaLN
(1+scale)+shift, EDM preconditioning, asymmetric downsample padding), run
them on random weights, convert their ``state_dict`` with
:mod:`rald_tpu.convert.torch_ckpt`, and require our flax forward to match
numerically. This validates both the converter and our re-implementation's
semantics against torch — the strongest oracle available (SURVEY.md §7
"Checkpoint parity").
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rald_tpu.convert.torch_ckpt import (
    convert_edm_state_dict,
    convert_radar_autoencoder_state_dict,
    convert_vae_state_dict,
)

DIM, DEPTH, M, LAT, HEADS, DH = 32, 2, 8, 4, 2, 16


# ------------------------------------------------------------ torch oracles
class TAttention(tnn.Module):
    """Reference models_ae.py:70-105 (fused to_kv)."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads, self.scale = heads, dim_head**-0.5
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_kv = tnn.Linear(context_dim, inner * 2, bias=False)
        self.to_out = tnn.Linear(inner, query_dim)

    def forward(self, x, context=None):
        h = self.heads
        context = x if context is None else context
        q = self.to_q(x)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        b, n, _ = q.shape
        q, k, v = (
            t.reshape(t.shape[0], t.shape[1], h, -1).permute(0, 2, 1, 3) for t in (q, k, v)
        )
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class TFeedForward(tnn.Module):
    """Reference models_ae.py:51-68: Linear(dim, 8*dim) -> GEGLU -> Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(dim, dim * mult * 2), tnn.Identity(), tnn.Linear(dim * mult, dim)
        )

    def forward(self, x):
        x = self.net[0](x)
        a, gates = x.chunk(2, dim=-1)
        return self.net[2](a * F.gelu(gates))


class TPreNorm(tnn.Module):
    def __init__(self, dim, fn, context_dim=None):
        super().__init__()
        self.fn = fn
        self.norm = tnn.LayerNorm(dim)
        self.norm_context = tnn.LayerNorm(context_dim) if context_dim else None

    def forward(self, x, context=None):
        x = self.norm(x)
        if self.norm_context is not None:
            return self.fn(x, context=self.norm_context(context))
        if context is not None:
            return self.fn(x, context=context)
        return self.fn(x)


class TPointEmbed(tnn.Module):
    """Reference models_ae.py:108-138."""

    def __init__(self, hidden_dim=48, dim=DIM):
        super().__init__()
        k = hidden_dim // 6
        e = (2.0 ** torch.arange(k).float()) * math.pi
        basis = torch.zeros(3, 3 * k)
        for a in range(3):
            basis[a, a * k : (a + 1) * k] = e
        self.register_buffer("basis", basis)
        self.mlp = tnn.Linear(hidden_dim + 3, dim)

    def forward(self, x):
        proj = torch.einsum("bnd,de->bne", x, self.basis)
        return self.mlp(torch.cat([proj.sin(), proj.cos(), x], dim=-1))


class TorchVAE(tnn.Module):
    """Reference KLAutoEncoder (models_ae.py:284-424), mix queries, tiny dims."""

    def __init__(self):
        super().__init__()
        self.point_embed = TPointEmbed(dim=DIM)
        self.cross_attend_blocks = tnn.ModuleList(
            [
                TPreNorm(DIM, TAttention(DIM, DIM, heads=1, dim_head=DIM), context_dim=DIM),
                TPreNorm(DIM, TFeedForward(DIM)),
            ]
        )
        self.s_latents = tnn.Embedding(M, DIM)
        self.d_latents = tnn.Embedding(M, DIM)
        self.mix_attn_layer = TPreNorm(DIM, TAttention(DIM, heads=HEADS, dim_head=DH))
        self.query_proj = tnn.Linear(DIM, DIM)
        self.layers = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [
                        TPreNorm(DIM, TAttention(DIM, heads=HEADS, dim_head=DH)),
                        TPreNorm(DIM, TFeedForward(DIM)),
                    ]
                )
                for _ in range(DEPTH)
            ]
        )
        self.decoder_cross_attn = TPreNorm(
            DIM, TAttention(DIM, DIM, heads=1, dim_head=DIM), context_dim=DIM
        )
        self.to_outputs = tnn.Linear(DIM, 1)
        self.proj = tnn.Linear(LAT, DIM)
        self.mean_fc = tnn.Linear(DIM, LAT)
        self.logvar_fc = tnn.Linear(DIM, LAT)

    def encode_stats(self, pc):
        pc_emb = self.point_embed(pc)
        b = pc.shape[0]
        static_q = self.s_latents.weight[None].expand(b, -1, -1)
        dynamic_q = self.d_latents.weight[None].expand(b, -1, -1)
        dynamic_q = self.mix_attn_layer(dynamic_q, context=pc_emb)
        x = self.query_proj(static_q + dynamic_q)
        cross_attn, cross_ff = self.cross_attend_blocks
        x = cross_attn(x, context=pc_emb) + x
        x = cross_ff(x) + x
        return self.mean_fc(x), torch.clamp(self.logvar_fc(x), -30.0, 20.0)

    def decode(self, z, queries):
        x = self.proj(z)
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        q_emb = self.point_embed(queries)
        out = self.decoder_cross_attn(q_emb, context=x)
        return self.to_outputs(out)


class TestVAEParity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(0)
        tmodel = TorchVAE().eval()
        params = convert_vae_state_dict(
            {k: v for k, v in tmodel.state_dict().items()}, depth=DEPTH, query_type="mix"
        )
        from rald_tpu.models.vecset_vae import VecSetVAE

        jmodel = VecSetVAE(
            depth=DEPTH, dim=DIM, queries_dim=DIM, num_inputs=64, num_latents=M,
            latent_dim=LAT, heads=HEADS, dim_head=DH, query_type="mix",
        )
        return tmodel, jmodel, {"params": params}

    def test_encode_stats_match(self, pair):
        tmodel, jmodel, variables = pair
        rng = np.random.default_rng(1)
        pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t_mean, t_logvar = tmodel.encode_stats(torch.from_numpy(pc))
        _, j_mean = jmodel.apply(variables, jnp.asarray(pc), sample_posterior=False, method="encode")
        np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), atol=2e-5)

    def test_decode_match(self, pair):
        tmodel, jmodel, variables = pair
        rng = np.random.default_rng(2)
        z = rng.normal(size=(2, M, LAT)).astype(np.float32)
        queries = rng.normal(size=(2, 37, 3)).astype(np.float32)
        with torch.no_grad():
            t_logits = tmodel.decode(torch.from_numpy(z), torch.from_numpy(queries))
        j_logits = jmodel.apply(variables, jnp.asarray(z), jnp.asarray(queries), method="decode")
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=2e-5)


# --------------------------------------------------------------- DiT oracle
class TCrossAttention(tnn.Module):
    """Reference models_radar_generation.py:35-76 (split k/v, Sequential out)."""

    def __init__(self, query_dim, context_dim=None, heads=2, dim_head=DH):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads, self.scale = heads, dim_head**-0.5
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, query_dim), tnn.Dropout(0.0))

    def forward(self, x, context=None):
        h = self.heads
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        b, n, _ = q.shape
        q, k, v = (
            t.reshape(t.shape[0], t.shape[1], h, -1).permute(0, 2, 1, 3) for t in (q, k, v)
        )
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class TGEGLUFF(tnn.Module):
    """Reference :88-117 with glu=True: net.0.proj GEGLU -> net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult

        class _GEGLU(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Linear(dim, inner * 2)

            def forward(self, x):
                a, g = self.proj(x).chunk(2, dim=-1)
                return a * F.gelu(g)

        self.net = tnn.Sequential(_GEGLU(), tnn.Dropout(0.0), tnn.Linear(inner, dim))

    def forward(self, x):
        return self.net(x)


class TAdaLN(tnn.Module):
    """Reference :119-131 — note: modulation Linear WITHOUT the silu."""

    def __init__(self, dim):
        super().__init__()
        self.linear = tnn.Linear(dim, dim * 2)
        self.layernorm = tnn.LayerNorm(dim, elementwise_affine=False)

    def forward(self, x, t):
        scale, shift = self.linear(t).chunk(2, dim=2)
        return self.layernorm(x) * (1 + scale) + shift


class TorchDiT(tnn.Module):
    """Reference LatentArrayTransformer (:171-233), tiny dims."""

    def __init__(self, channels=LAT, inner=DIM, depth=DEPTH, t_channels=16):
        super().__init__()
        self.t_channels = t_channels
        self.proj_in = tnn.Linear(channels, inner, bias=False)

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.attn1 = TCrossAttention(inner)
                self.ff = TGEGLUFF(inner)
                self.attn2 = TCrossAttention(inner, context_dim=inner)
                self.norm1, self.norm2, self.norm3 = TAdaLN(inner), TAdaLN(inner), TAdaLN(inner)

            def forward(self, x, t, context):
                x = self.attn1(self.norm1(x, t)) + x
                x = self.attn2(self.norm2(x, t), context=context) + x
                x = self.ff(self.norm3(x, t)) + x
                return x

        self.transformer_blocks = tnn.ModuleList([Block() for _ in range(depth)])
        self.norm = tnn.LayerNorm(inner)
        self.proj_out = tnn.Linear(inner, channels, bias=False)
        tnn.init.zeros_(self.proj_out.weight)
        # fill with random for the parity test (zero would hide bugs)
        tnn.init.normal_(self.proj_out.weight, std=0.02)
        self.map_layer0 = tnn.Linear(t_channels, inner)
        self.map_layer1 = tnn.Linear(inner, inner)

    def map_noise(self, t):
        half = self.t_channels // 2
        freqs = torch.arange(half, dtype=torch.float32) / half
        freqs = (1 / 10000) ** freqs
        ang = t.ger(freqs)
        return torch.cat([ang.cos(), ang.sin()], dim=1)

    def forward(self, x, t, cond):
        t_emb = self.map_noise(t)[:, None]
        t_emb = F.silu(self.map_layer0(t_emb))
        t_emb = F.silu(self.map_layer1(t_emb))
        x = self.proj_in(x)
        for b in self.transformer_blocks:
            x = b(x, t_emb, cond)
        return self.proj_out(self.norm(x))


class TestDiTParity:
    def test_denoiser_core_match(self):
        torch.manual_seed(3)
        tmodel = TorchDiT().eval()
        sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
        params = convert_edm_state_dict(sd, depth=DEPTH)

        from rald_tpu.models.latent_dit import LatentArrayTransformer

        jmodel = LatentArrayTransformer(
            in_channels=LAT, t_channels=16, n_heads=HEADS, d_head=DH, depth=DEPTH
        )
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, M, LAT)).astype(np.float32)
        t = np.asarray([0.5, 2.0], np.float32)
        cond = rng.normal(size=(2, 6, DIM)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond))
        j_out = jmodel.apply(
            {"params": params["model"]}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond)
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=3e-5)

    def test_edm_preconditioning_match(self):
        """D(x;sigma) wrapper math (reference :412-430) on the converted core."""
        torch.manual_seed(5)
        tmodel = TorchDiT().eval()
        sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
        params = convert_edm_state_dict(sd, depth=DEPTH)

        from rald_tpu.models.latent_dit import EDMPrecond

        jmodel = EDMPrecond(
            n_latents=M, channels=LAT, depth=DEPTH, n_heads=HEADS, d_head=DH,
            cond_type="none",
        )
        # EDMPrecond owns 'model' as submodule; cond_type none skips radar params
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, M, LAT)).astype(np.float32)
        sigma = np.asarray([0.7, 3.0], np.float32)

        with torch.no_grad():
            s = torch.from_numpy(sigma).reshape(-1, 1, 1)
            c_skip = 1 / (s**2 + 1)
            c_out = s / (s**2 + 1).sqrt()
            c_in = 1 / (1 + s**2).sqrt()
            c_noise = s.log() / 4
            fx = tmodel(c_in * torch.from_numpy(x), c_noise.flatten(), None)
            t_out = c_skip * torch.from_numpy(x) + c_out * fx

        # our EDMPrecond with t_channels=256 differs; call the core directly
        from rald_tpu.models.latent_dit import LatentArrayTransformer

        core = LatentArrayTransformer(
            in_channels=LAT, t_channels=16, n_heads=HEADS, d_head=DH, depth=DEPTH
        )

        def denoise(x, sigma):
            s = jnp.reshape(sigma, (-1, 1, 1))
            c_skip = 1 / (s**2 + 1)
            c_out = s * jax.lax.rsqrt(s**2 + 1)
            c_in = jax.lax.rsqrt(1 + s**2)
            c_noise = jnp.log(s) / 4
            fx = core.apply({"params": params["model"]}, c_in * x, c_noise.reshape(-1), None)
            return c_skip * x + c_out * fx

        j_out = denoise(jnp.asarray(x), jnp.asarray(sigma))
        # rsqrt vs 1/sqrt + f32 accumulation-order noise; real bugs are O(1)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)


# ------------------------------------------------------- radar CNN oracle
def _tgroupnorm(c):
    return tnn.GroupNorm(math.gcd(32, c), c, eps=1e-6)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _tgroupnorm(cin)
        self.conv1 = tnn.Conv3d(cin, cout, 3, padding=1)
        self.norm2 = _tgroupnorm(cout)
        self.conv2 = tnn.Conv3d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv3d(cin, cout, 1)
        self.diff = cin != cout

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.diff:
            x = self.nin_shortcut(x)
        return x + h


class TAttn3D(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _tgroupnorm(c)
        self.q = tnn.Conv3d(c, c, 1)
        self.k = tnn.Conv3d(c, c, 1)
        self.v = tnn.Conv3d(c, c, 1)
        self.proj_out = tnn.Conv3d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c = q.shape[:2]
        q = q.reshape(b, c, -1).permute(0, 2, 1)
        k = k.reshape(b, c, -1)
        w = (torch.bmm(q, k) * c**-0.5).softmax(dim=2)
        v = v.reshape(b, c, -1)
        h = torch.bmm(v, w.permute(0, 2, 1)).reshape(*x.shape)
        return x + self.proj_out(h)


class TorchRadarEncoder(tnn.Module):
    """Reference Encoder (:137-241), 2 levels, 1 res block, no level attn."""

    def __init__(self, ch=8, zc=4, in_ch=1):
        super().__init__()
        self.conv_in = tnn.Conv3d(in_ch, ch, 3, padding=1)
        mults = (1, 2)

        class Level(tnn.Module):
            pass

        self.down = tnn.ModuleList()
        cin = ch
        for i, m in enumerate(mults):
            lvl = Level()
            lvl.block = tnn.ModuleList([TResBlock(cin, ch * m)])
            lvl.attn = tnn.ModuleList()
            cin = ch * m
            if i != len(mults) - 1:
                lvl.downsample = Level()
                lvl.downsample.conv = tnn.Conv3d(cin, cin, 3, stride=2)
            self.down.append(lvl)

        class Mid(tnn.Module):
            pass

        self.mid = Mid()
        self.mid.block_1 = TResBlock(cin, cin)
        self.mid.attn_1 = TAttn3D(cin)
        self.mid.block_2 = TResBlock(cin, cin)
        self.norm_out = _tgroupnorm(cin)
        self.conv_out = tnn.Conv3d(cin, zc, 3, padding=1)
        self.num_levels = len(mults)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            h = lvl.block[0](h)
            if i != self.num_levels - 1:
                h = F.pad(h, (0, 1, 0, 1, 0, 1))
                h = lvl.downsample.conv(h)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TestRadarEncoderParity:
    def test_encoder_match(self):
        torch.manual_seed(7)
        tmodel = TorchRadarEncoder().eval()
        from rald_tpu.convert.torch_ckpt import convert_radar_encoder_state_dict
        from rald_tpu.models.radar_encoder3d import RadarEncoder3D

        params = convert_radar_encoder_state_dict(
            tmodel.state_dict(), num_levels=2, num_res_blocks=1
        )
        jmodel = RadarEncoder3D(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                attn_resolutions=(), z_channels=4)
        rng = np.random.default_rng(8)
        cube = rng.normal(size=(2, 8, 4, 4, 1)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(cube).permute(0, 4, 1, 2, 3))
        j_out = jmodel.apply({"params": params}, jnp.asarray(cube))
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.permute(0, 2, 3, 4, 1).numpy(), atol=3e-5
        )


class TestConvertCLI:
    def test_ae_roundtrip_through_eval_checkpoint(self, tmp_path):
        """torch .pth -> convert_ckpt CLI -> main_ae eval-mode restore."""
        torch.manual_seed(11)
        tmodel = TorchVAE().eval()
        pth = tmp_path / "ref.pth"
        torch.save({"model": tmodel.state_dict()}, pth)

        from rald_tpu.config import Config
        from rald_tpu.cli.convert_ckpt import run as convert_run

        cfg = Config(
            system={"seed": 0, "compute_dtype": "float32"},
            dataset={"lidar": {"num_samples": 64, "query_ratio": 0.0625}},
            train={"epochs": 1, "warmup_epochs": 0, "blr": 1e-4, "lr": 1e-4,
                   "min_lr": 1e-6, "clip_grad": 10},
            lidar_ae={
                "name": "kl_d512_m512_l32_mix",
                "overrides": {"dim": DIM, "queries_dim": DIM, "depth": DEPTH,
                               "num_latents": M, "latent_dim": LAT,
                               "heads": HEADS, "dim_head": DH},
            },
        )
        path = convert_run(cfg, "ae", str(pth), str(tmp_path / "out"), epoch=7)
        assert path.name == "checkpoint-7"

        # restore through the standard manager and check forward parity
        from rald_tpu.train.ae_engine import AEEngine
        from rald_tpu.train.checkpoint import CheckpointManager

        engine = AEEngine(cfg)
        state = engine.init_state(1, 1)
        state, epoch = CheckpointManager(tmp_path / "out").restore(state, path)
        assert epoch == 7
        rng = np.random.default_rng(12)
        z = rng.normal(size=(1, M, LAT)).astype(np.float32)
        q = rng.normal(size=(1, 21, 3)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel.decode(torch.from_numpy(z), torch.from_numpy(q))
        j_out = engine.model.apply(
            {"params": state.params}, jnp.asarray(z), jnp.asarray(q), method="decode"
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=5e-5)
