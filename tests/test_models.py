"""Model-layer tests: shapes/dtype contracts, FPS properties, math oracles.

The reference ships no tests (SURVEY.md §4); oracles here are small numpy
re-derivations of the documented math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rald_tpu.nn.layers import FourierTimeEmbedding, PointEmbed, point_fourier_basis
from rald_tpu.ops.fps import farthest_point_sampling, fps_points
from rald_tpu.ops.query_attention import map_query_chunks, streaming_single_head_attention
from rald_tpu.models.vecset_vae import create_autoencoder
from rald_tpu.models.radar_encoder3d import RadarEncoder3D, RadarAutoencoder
from rald_tpu.models.latent_dit import EDMPrecond, LatentArrayTransformer
from rald_tpu.models.registry import get_ae_model, get_generation_model


class TestFPS:
    def test_indices_distinct_and_spread(self):
        rng = np.random.default_rng(0)
        # two tight clusters + far outlier: FPS must visit all three
        pts = np.concatenate([
            rng.normal(0, 0.01, (50, 3)),
            rng.normal(5, 0.01, (50, 3)),
            np.array([[100.0, 0, 0]]),
        ]).astype(np.float32)
        idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 8, start_idx=0))
        assert len(set(idx.tolist())) == 8
        sel = pts[idx]
        assert (sel[:, 0] > 50).any()  # outlier picked
        assert (np.linalg.norm(sel - 5, axis=1) < 1).any()  # far cluster visited

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(64, 3)).astype(np.float32)

        def np_fps(p, m):
            idxs = [0]
            d = np.full(len(p), np.inf)
            for _ in range(1, m):
                d = np.minimum(d, ((p - p[idxs[-1]]) ** 2).sum(-1))
                idxs.append(int(d.argmax()))
            return np.array(idxs)

        got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 16))
        np.testing.assert_array_equal(got, np_fps(pts, 16))

    def test_batched(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(3, 128, 3)).astype(np.float32))
        out = fps_points(pts, 32)
        assert out.shape == (3, 32, 3)


class TestStreamingAttention:
    def test_matches_dense(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(2, 300, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 17, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 17, 32)).astype(np.float32))
        dense = jax.nn.softmax(jnp.einsum("bqd,bmd->bqm", q, k) * 32**-0.5) @ v
        streamed = streaming_single_head_attention(q, k, v, chunk_size=64)
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense), atol=1e-5)

    def test_map_query_chunks_ragged_tail(self):
        x = jnp.arange(2 * 130 * 3, dtype=jnp.float32).reshape(2, 130, 3)
        out = map_query_chunks(lambda b: b * 2.0, x, chunk_size=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


class TestEmbeddings:
    def test_point_fourier_basis_matches_reference_layout(self):
        basis = point_fourier_basis(48)
        assert basis.shape == (3, 24)
        np.testing.assert_allclose(basis[0, :8], (2.0 ** np.arange(8)) * np.pi, rtol=1e-6)
        assert (basis[0, 8:] == 0).all() and (basis[1, :8] == 0).all()

    def test_point_embed_shape(self):
        pe = PointEmbed(dim=64)
        x = jnp.zeros((2, 10, 3))
        params = pe.init(jax.random.PRNGKey(0), x)
        out = pe.apply(params, x)
        assert out.shape == (2, 10, 64)

    def test_time_embedding_oracle(self):
        emb = FourierTimeEmbedding(num_channels=8, max_positions=10000)
        t = jnp.asarray([2.0])
        out = np.asarray(emb.apply({}, t))[0]
        freqs = (1 / 10000) ** (np.arange(4) / 4)
        expect = np.concatenate([np.cos(2 * freqs), np.sin(2 * freqs)])
        np.testing.assert_allclose(out, expect, rtol=1e-5)


class TestVecSetVAE:
    @pytest.mark.parametrize("query_type", ["mix", "learnable", "point"])
    def test_forward_contract(self, query_type):
        model = create_autoencoder(dim=64, M=16, latent_dim=8, N=128, query_type=query_type)
        pc = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
        queries = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "latent": jax.random.PRNGKey(3)}, pc, queries
        )
        out = model.apply(
            variables, pc, queries, rngs={"latent": jax.random.PRNGKey(4)}
        )
        assert out["logits"].shape == (2, 40)
        assert out["kl"].shape == (2,)
        assert out["logits"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["logits"])).all()
        assert (np.asarray(out["kl"]) >= 0).all()

    def test_encode_decode_methods_and_mean_latent(self):
        model = create_autoencoder(dim=64, M=16, latent_dim=8, N=128, query_type="mix")
        pc = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 3))
        queries = jax.random.normal(jax.random.PRNGKey(1), (1, 33, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "latent": jax.random.PRNGKey(3)}, pc, queries
        )
        kl, z = model.apply(variables, pc, sample_posterior=False, method="encode")
        assert z.shape == (1, 16, 8)
        # posterior mean is deterministic
        _, z2 = model.apply(variables, pc, sample_posterior=False, method="encode")
        np.testing.assert_allclose(np.asarray(z), np.asarray(z2))
        logits = model.apply(variables, z, queries, method="decode")
        assert logits.shape == (1, 33, 1)

    def test_decode_streaming_equals_single_chunk(self):
        model_small = create_autoencoder(dim=64, M=16, latent_dim=8, N=128, query_type="mix")
        model_chunked = model_small.copy(query_chunk=16)
        pc = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 3))
        queries = jax.random.normal(jax.random.PRNGKey(1), (1, 50, 3))
        variables = model_small.init(
            {"params": jax.random.PRNGKey(2), "latent": jax.random.PRNGKey(3)}, pc, queries
        )
        z = model_small.apply(variables, pc, sample_posterior=False, method="encode")[1]
        a = model_small.apply(variables, z, queries, method="decode")
        b = model_chunked.apply(variables, z, queries, method="decode")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_registry_names(self):
        m = get_ae_model("kl_d512_m512_l32_mix", N=10000)
        assert m.latent_dim == 32 and m.query_type == "mix" and m.num_inputs == 10000
        m = get_ae_model("ae_d512_m128")
        assert m.deterministic_latent and m.num_latents == 128


class TestRadarEncoder:
    def test_encoder_downsamples_16x(self):
        enc = RadarEncoder3D(ch=16, z_channels=4)
        x = jnp.zeros((1, 32, 16, 32, 1))
        params = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(params, x)
        assert z.shape == (1, 2, 1, 2, 4)

    def test_autoencoder_roundtrip_shape(self):
        ae = RadarAutoencoder(basic_channel=16, embed_dim=4, in_channels=2)
        x = jnp.zeros((1, 32, 16, 16, 2))
        params = ae.init(jax.random.PRNGKey(0), x)
        out = ae.apply(params, x)
        assert out["pred"].shape == x.shape
        assert out["latent"].shape == (1, 2, 1, 1, 4)


class TestLatentDiT:
    def test_zero_init_output(self):
        model = LatentArrayTransformer(in_channels=8, depth=2, n_heads=2, d_head=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
        t = jnp.ones((2,))
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
        params = model.init(jax.random.PRNGKey(2), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (2, 16, 8)
        # zero-init proj_out -> F(x) == 0 at init
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_edm_precond_identity_at_init(self):
        """With zero-init proj_out, D(x; sigma) == c_skip * x at init."""
        model = EDMPrecond(
            n_latents=16, channels=8, depth=2, n_heads=2, d_head=16,
            unfreeze_radar_enc=True, use_radar_enc=True,
            enc_radar_dims=(2, 1, 2), enc_radar_ch=4, enc_hidden_ch=16,
            radar_token_channel=32,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
        sigma = jnp.asarray([1.0, 2.0])
        cube = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16, 32, 3))
        params = model.init(jax.random.PRNGKey(2), x, sigma, cube)
        out = model.apply(params, x, sigma, cube)
        s = sigma.reshape(-1, 1, 1)
        c_skip = 1.0 / (s**2 + 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c_skip * x), atol=1e-5)

    def test_cond_token_count(self):
        model = EDMPrecond(
            n_latents=16, channels=8, depth=1, n_heads=2, d_head=16,
            unfreeze_radar_enc=True, use_radar_enc=True,
            enc_radar_dims=(2, 1, 2), enc_radar_ch=4, enc_hidden_ch=16,
            radar_token_channel=32,
        )
        x = jnp.zeros((1, 16, 8))
        cube = jnp.zeros((1, 32, 16, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)), cube)
        tokens = model.apply(params, cube, method="process_radar_cond")
        assert tokens.shape == (1, 2 * 1 * 2, 32)

    def test_registry_generation(self):
        from rald_tpu.config import Config

        cfg = Config(
            cond_type="radar", use_radar_enc=True, unfreeze_radar_enc=True,
            radar_token_channel=512,
            enc_radar_r_dim=8, enc_radar_a_dim=4, enc_radar_e_dim=2,
            enc_radar_ch=16, enc_hidden_ch=64,
        )
        m = get_generation_model("kl_d512_m512_l32_d24_edm", cfg)
        assert m.channels == 32 and m.depth == 24 and m.unfreeze_radar_enc


class TestDeterministicAutoEncoder:
    def test_forward_contract(self):
        """Reference AutoEncoder (models_ae.py:181, no KL/proj) forward."""
        model = create_autoencoder(dim=64, M=16, N=128, deterministic=True, query_type="point")
        pc = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 3))
        queries = jax.random.normal(jax.random.PRNGKey(1), (1, 25, 3))
        variables = model.init({"params": jax.random.PRNGKey(2)}, pc, queries)
        out = model.apply(variables, pc, queries)
        assert out["logits"].shape == (1, 25)
        assert float(jnp.sum(out["kl"])) == 0.0  # deterministic: no KL
        # latent is the full-dim token state, decode needs no proj
        kl, z = model.apply(variables, pc, method="encode")
        assert z.shape == (1, 16, 64)
