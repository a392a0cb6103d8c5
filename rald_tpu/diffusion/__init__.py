from rald_tpu.diffusion.edm import (
    edm_loss,
    edm_sampler,
    karras_sigmas,
    per_sample_keys,
    sample_prior_latents,
)

__all__ = [
    "edm_loss",
    "edm_sampler",
    "karras_sigmas",
    "per_sample_keys",
    "sample_prior_latents",
]
