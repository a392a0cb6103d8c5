"""EDM (Karras et al.) diffusion: sigma schedule, Heun sampler, training loss.

Capability parity with ``model/models_radar_generation.py``:

- :func:`karras_sigmas`  <- ``edm_sampler`` time-step discretization
  (:246-249): rho-7 schedule from sigma_max to sigma_min, terminal 0.
- :func:`edm_sampler`    <- :235-275: 2nd-order Heun sampler with optional
  stochastic churn (defaults S_churn=0 as the reference pins, :239). The
  reference's per-step Python loop becomes a single ``lax.scan`` over the
  first ``num_steps - 1`` (Heun) steps plus one trailing Euler step — the
  whole 35-NFE chain compiles into one XLA program with zero host
  round-trips, and the condition tokens are computed once outside the loop
  (the reference recomputes them every NFE).
- :func:`edm_loss`       <- ``EDMLoss`` (:277-295): log-normal sigma
  sampling (P_mean=-1.2, P_std=1.2), lambda(sigma)-weighted MSE.
- :func:`per_sample_keys` <- ``StackedRandomGenerator`` (:297-311)
  *semantics*: one independent, seed-keyed random stream per sample
  (``jax.random.fold_in`` per seed), so generation is reproducible
  per-frame regardless of batching — not bitwise RNG equality with torch.

``denoise_fn(x, sigma) -> D(x; sigma)`` closes over params and (already
processed) condition tokens.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def karras_sigmas(
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> jax.Array:
    """(num_steps + 1,) noise levels: rho-spaced descending, terminal 0."""
    idx = jnp.arange(num_steps, dtype=jnp.float32)
    t = (
        sigma_max ** (1 / rho)
        + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    return jnp.concatenate([t, jnp.zeros((1,), jnp.float32)])


def per_sample_keys(seeds: jax.Array) -> jax.Array:
    """Independent PRNG keys keyed by integer seed, one per sample."""
    base = jax.random.PRNGKey(0)
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(jnp.asarray(seeds, jnp.uint32))


def sample_prior_latents(seeds: jax.Array, n_latents: int, channels: int) -> jax.Array:
    """(B, n_latents, channels) unit-normal prior draws, per-sample streams."""
    keys = per_sample_keys(seeds)
    return jax.vmap(lambda k: jax.random.normal(k, (n_latents, channels)))(keys)


def stack_mod_table(table):
    """Stack a ``compute_mod_table`` pytree into one (S, depth, 3, 2, 1, C) array.

    The table has 2*3*depth small leaves; indexing it per NFE with a
    ``tree_map`` costs one dynamic-slice op per leaf (144 at depth 24) inside
    the sampler scan. Stacked, the per-NFE lookup is ONE dynamic slice and the
    per-block unpack is static indexing (free at compile time).
    """
    rows = []
    for block in table:  # tuple over depth
        rows.append(jnp.stack([jnp.stack(pair) for pair in block]))  # (3, 2, S, 1, C)
    stacked = jnp.stack(rows)  # (depth, 3, 2, S, 1, C)
    return jnp.moveaxis(stacked, 3, 0)  # (S, depth, 3, 2, 1, C)


def unstack_mods(sl: jax.Array):
    """(depth, 3, 2, 1, C) schedule-step slice -> ``compute_mod_table``-shaped mods."""
    return tuple(
        ((sl[i, 0, 0], sl[i, 0, 1]), (sl[i, 1, 0], sl[i, 1, 1]), (sl[i, 2, 0], sl[i, 2, 1]))
        for i in range(sl.shape[0])
    )


def edm_sampler(
    denoise_fn: DenoiseFn,
    latents: jax.Array,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 0.0,
    s_min: float = 0.0,
    s_max: float = float("inf"),
    s_noise: float = 1.0,
    noise_keys: Optional[jax.Array] = None,
    denoise_indexed: Optional[Callable] = None,
    capture_states: bool = False,
) -> jax.Array:
    """Heun sampler from unit-normal ``latents`` (B, M, C) (reference :235-275).

    2-NFE Heun steps for i < num_steps-1, 1-NFE Euler for the final step:
    exactly the reference's 2*num_steps - 1 denoiser evaluations.
    ``noise_keys`` (B,) per-sample keys are only needed when s_churn > 0.

    ``denoise_indexed(x, sigma, step_idx)``, when given, replaces
    ``denoise_fn`` and also receives the schedule index of ``sigma`` —
    letting the denoiser look up precomputed sigma-dependent state (AdaLN
    modulation tables). Only valid without churn (churn perturbs sigma off
    the schedule).

    ``capture_states=True`` additionally returns every (schedule_index,
    state) pair the denoiser was evaluated at, as ``(idxs (2*num_steps-1,),
    xs (2*num_steps-1, B, M, C))`` in call order — the inputs one needs to
    replay the denoiser offline (int8 activation-scale calibration,
    trajectory debugging) without duplicating the Heun semantics. Return
    value becomes ``(x_final, (idxs, xs))``. Caveat: with ``s_churn > 0``
    the denoiser is evaluated at the churned sigma ``t_hat != t_steps[idx]``,
    so a captured index does NOT identify the evaluation sigma — replaying
    at ``t_steps[idx]`` is only exact when churn is off (the calibration
    path enforces this, GenerationEngine.calibrate_act_scales).
    """
    if denoise_indexed is not None:
        assert s_churn <= 0, "denoise_indexed requires s_churn == 0 (on-schedule sigmas)"
        call = denoise_indexed
    else:
        call = lambda x, sigma, idx: denoise_fn(x, sigma)

    t_steps = karras_sigmas(num_steps, sigma_min, sigma_max, rho)
    x = latents.astype(jnp.float32) * t_steps[0]

    gamma_cap = min(s_churn / num_steps, math.sqrt(2.0) - 1.0)

    def churn(x_cur, t_cur, step_i):
        if s_churn <= 0:
            return x_cur, t_cur
        gamma = jnp.where((t_cur >= s_min) & (t_cur <= s_max), gamma_cap, 0.0)
        t_hat = t_cur + gamma * t_cur
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, step_i))(noise_keys)
        eps = jax.vmap(lambda k, s: jax.random.normal(k, s.shape))(step_keys, x_cur)
        x_hat = x_cur + jnp.sqrt(jnp.maximum(t_hat**2 - t_cur**2, 0.0)) * s_noise * eps
        return x_hat, t_hat

    def heun_step(x_cur, step):
        step_i, t_cur, t_next = step
        x_hat, t_hat = churn(x_cur, t_cur, step_i)
        denoised = call(x_hat, t_hat, step_i)
        d_cur = (x_hat - denoised) / t_hat
        x_next = x_hat + (t_next - t_hat) * d_cur
        denoised2 = call(x_next, t_next, step_i + 1)
        d_prime = (x_next - denoised2) / t_next
        x_out = x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)
        ys = ((step_i, x_hat), (step_i + 1, x_next)) if capture_states else None
        return x_out, ys

    steps = (
        jnp.arange(num_steps - 1),
        t_steps[: num_steps - 1],
        t_steps[1:num_steps],
    )
    x, ys = jax.lax.scan(heun_step, x, steps)

    # final Euler step to sigma = 0 (no 2nd-order correction, reference :269)
    t_cur, t_next = t_steps[num_steps - 1], t_steps[num_steps]
    x_hat, t_hat = churn(x, t_cur, num_steps - 1)
    denoised = call(x_hat, t_hat, num_steps - 1)
    x_final = x_hat + (t_next - t_hat) * (x_hat - denoised) / t_hat
    if not capture_states:
        return x_final
    (i1, x1), (i2, x2) = ys  # each (num_steps-1, ...) in scan-step order
    idxs = jnp.concatenate(
        [jnp.stack([i1, i2], axis=1).reshape(-1), jnp.array([num_steps - 1])]
    )
    xs = jnp.concatenate(
        [jnp.stack([x1, x2], axis=1).reshape(-1, *x1.shape[1:]), x_hat[None]]
    )
    return x_final, (idxs, xs)


def edm_loss(
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    y: jax.Array,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    sigma_data: float = 1.0,
) -> jax.Array:
    """EDM weighted denoising MSE (reference EDMLoss, :277-295)."""
    rng_sigma, rng_noise = jax.random.split(rng)
    rnd = jax.random.normal(rng_sigma, (y.shape[0], 1, 1))
    sigma = jnp.exp(rnd * p_std + p_mean)
    weight = (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2
    n = jax.random.normal(rng_noise, y.shape) * sigma
    d_yn = denoise_fn(y + n, sigma)
    return jnp.mean(weight * (d_yn - y.astype(jnp.float32)) ** 2)
