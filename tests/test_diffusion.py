"""EDM diffusion tests against analytic oracles.

For a zero-mean unit-variance Gaussian data distribution the optimal EDM
denoiser is linear: D*(x; sigma) = x / (1 + sigma^2) (with sigma_data=1).
Plugging it into the sampler must reproduce prior-like statistics; the
loss at the optimum equals the analytic minimum.
"""
import numpy as np
import jax
import jax.numpy as jnp

from rald_tpu.diffusion.edm import (
    edm_loss,
    edm_sampler,
    karras_sigmas,
    per_sample_keys,
    sample_prior_latents,
)


def optimal_gaussian_denoiser(x, sigma):
    sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1)
    return x / (1.0 + sigma**2)


class TestSchedule:
    def test_karras_schedule_oracle(self):
        got = np.asarray(karras_sigmas(18, 0.002, 80.0, 7.0))
        idx = np.arange(18, dtype=np.float64)
        expect = (80 ** (1 / 7) + idx / 17 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
        np.testing.assert_allclose(got[:18], expect, rtol=1e-5)
        assert got[18] == 0.0
        assert got.shape == (19,)
        assert (np.diff(got) < 0).all()


class TestSampler:
    def test_gaussian_target_statistics(self):
        """Sampling with the optimal Gaussian denoiser yields ~N(0,1) samples."""
        latents = sample_prior_latents(jnp.arange(64), 32, 8)
        out = np.asarray(edm_sampler(optimal_gaussian_denoiser, latents, num_steps=18))
        assert out.shape == (64, 32, 8)
        assert abs(out.mean()) < 0.05
        assert abs(out.std() - 1.0) < 0.05

    def test_deterministic_and_seed_keyed(self):
        latents = sample_prior_latents(jnp.asarray([3, 4]), 16, 4)
        a = edm_sampler(optimal_gaussian_denoiser, latents)
        b = edm_sampler(optimal_gaussian_denoiser, latents)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # per-sample streams: sample with seed 4 alone == second row of [3,4]
        solo = sample_prior_latents(jnp.asarray([4]), 16, 4)
        np.testing.assert_array_equal(np.asarray(solo[0]), np.asarray(latents[1]))

    def test_churn_path_runs(self):
        latents = sample_prior_latents(jnp.arange(4), 16, 4)
        keys = per_sample_keys(jnp.arange(4))
        out = edm_sampler(
            optimal_gaussian_denoiser, latents, num_steps=10,
            s_churn=40.0, s_min=0.05, s_max=50.0, s_noise=1.003, noise_keys=keys,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_nfe_count(self):
        calls = []

        def counting_denoiser(x, sigma):
            calls.append(1)
            return optimal_gaussian_denoiser(x, sigma)

        latents = sample_prior_latents(jnp.arange(2), 8, 4)
        # trace without jit so each call is recorded
        edm_sampler(counting_denoiser, latents, num_steps=18)
        # scan traces its body once (2 calls) + final Euler (1 call) = 3 traces;
        # the *executed* NFE count is (18-1)*2 + 1 = 35, matching the reference.
        assert len(calls) == 3

    def test_capture_states(self):
        """capture_states returns every (schedule index, state) the denoiser
        saw — 2*num_steps-1 pairs in call order — without changing x_final."""
        from rald_tpu.diffusion.edm import karras_sigmas

        latents = sample_prior_latents(jnp.arange(4), 16, 4)
        plain = edm_sampler(optimal_gaussian_denoiser, latents, num_steps=5)
        x, (idxs, xs) = edm_sampler(
            optimal_gaussian_denoiser, latents, num_steps=5, capture_states=True
        )
        np.testing.assert_array_equal(np.asarray(x), np.asarray(plain))
        # Heun step i calls at indices (i, i+1); final Euler at num_steps-1
        np.testing.assert_array_equal(
            np.asarray(idxs), [0, 1, 1, 2, 2, 3, 3, 4, 4]
        )
        assert xs.shape == (9, 4, 16, 4)
        # first captured state is the sigma_max-scaled prior draw
        t0 = karras_sigmas(5)[0]
        np.testing.assert_allclose(
            np.asarray(xs[0]), np.asarray(latents * t0), rtol=1e-6
        )
        assert np.isfinite(np.asarray(xs)).all()

    def test_few_step_sampling_degrades_gracefully(self):
        """At 5 steps Heun discretization error grows but stays bounded."""
        latents = sample_prior_latents(jnp.arange(256), 64, 4)
        out = np.asarray(edm_sampler(optimal_gaussian_denoiser, latents, num_steps=5))
        assert np.isfinite(out).all()
        # huge sigma gaps at 5 steps overshoot; ~1.9 observed, 18 steps ~1.05
        assert 0.5 < out.std() < 2.5


class TestLoss:
    def test_loss_at_optimum_matches_analytic(self):
        """E[loss] for D* on N(0,1) data: weight * E[(D*(y+n) - y)^2] per
        sigma equals weight * sigma^2/(1+sigma^2) ... averaged over the
        log-normal sigma draw. Monte-Carlo check within tolerance."""
        rng = jax.random.PRNGKey(0)
        y = jax.random.normal(jax.random.PRNGKey(1), (512, 16, 4))
        loss = float(edm_loss(optimal_gaussian_denoiser, rng, y))

        # analytic expectation: for given sigma, weight * E[(x/(1+s^2) - y)^2]
        # where x = y + n. D* - y = (n - s^2 y)/(1+s^2);
        # E[(D*-y)^2] = (s^2 + s^4)/(1+s^2)^2 = s^2/(1+s^2).
        # weight = (s^2+1)/s^2  ->  weight * E = 1/(1+s^2) ... wait:
        # weight * s^2/(1+s^2) = ((s^2+1)/s^2) * (s^2/(1+s^2)) = 1.
        assert abs(loss - 1.0) < 0.05

    def test_loss_decreases_for_better_denoiser(self):
        rng = jax.random.PRNGKey(0)
        y = jax.random.normal(jax.random.PRNGKey(1), (256, 16, 4))
        good = float(edm_loss(optimal_gaussian_denoiser, rng, y))
        bad = float(edm_loss(lambda x, s: jnp.zeros_like(x), rng, y))
        assert good < bad


class TestModTableSampling:
    def test_indexed_path_matches_plain_denoise(self):
        """Precomputed AdaLN-mod sampling == per-NFE modulation computation."""
        import jax
        from rald_tpu.models.latent_dit import EDMPrecond
        from rald_tpu.diffusion.edm import edm_sampler, karras_sigmas

        model = EDMPrecond(
            n_latents=16, channels=8, depth=2, n_heads=2, d_head=16, cond_type="none"
        )
        x0 = jnp.zeros((2, 16, 8))
        params = model.init(jax.random.PRNGKey(0), x0, jnp.ones((2,)), None)["params"]
        latents = sample_prior_latents(jnp.arange(2), 16, 8)
        num_steps = 6

        def denoise(x, sigma):
            return model.apply({"params": params}, x, sigma, None, method="denoise")

        plain = edm_sampler(denoise, latents, num_steps=num_steps)

        t_steps = karras_sigmas(num_steps)
        table = model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")

        def denoise_indexed(x, sigma, idx):
            mods = jax.tree_util.tree_map(lambda a: a[idx], table)
            return model.apply(
                {"params": params}, x, sigma, mods, None, method="denoise_with_mods"
            )

        indexed = edm_sampler(
            lambda x, s: None, latents, num_steps=num_steps, denoise_indexed=denoise_indexed
        )
        np.testing.assert_allclose(np.asarray(indexed), np.asarray(plain), atol=1e-5)
