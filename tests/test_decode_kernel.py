"""Fused decode-tail Pallas kernel vs the reference XLA path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rald_tpu.models.vecset_vae import create_autoencoder
from rald_tpu.ops.decode_kernel import decode_tail_kv, decode_tail_params, fused_decode_tail


@pytest.fixture(scope="module")
def vae_setup():
    model = create_autoencoder(dim=512, M=16, latent_dim=8, N=128, query_type="mix")
    pc = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 3))
    queries = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "latent": jax.random.PRNGKey(3)}, pc, queries
    )
    return model, variables


class TestFusedDecodeTail:
    def test_matches_xla_path(self, vae_setup):
        model, variables = vae_setup
        rng = np.random.default_rng(4)
        z = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
        queries = jnp.asarray(rng.uniform(-1, 1, size=(2, 300, 3)).astype(np.float32))

        want = model.apply(variables, z, queries, method="decode")
        tokens = model.apply(variables, z, method="decode_latents")
        k, v = decode_tail_kv(model, variables, tokens)
        got = fused_decode_tail(
            queries, **decode_tail_params(variables), k=k, v=v,
            tile_q=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_ragged_query_padding(self, vae_setup):
        model, variables = vae_setup
        rng = np.random.default_rng(5)
        z = jnp.asarray(rng.normal(size=(1, 16, 8)).astype(np.float32))
        queries = jnp.asarray(rng.uniform(-1, 1, size=(1, 77, 3)).astype(np.float32))
        tokens = model.apply(variables, z, method="decode_latents")
        k, v = decode_tail_kv(model, variables, tokens)
        got = fused_decode_tail(
            queries, **decode_tail_params(variables), k=k, v=v,
            tile_q=128, interpret=True,
        )
        want = model.apply(variables, z, queries, method="decode")
        assert got.shape == (1, 77, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
