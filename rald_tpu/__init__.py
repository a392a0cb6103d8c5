"""RaLD-TPU: a TPU-native (JAX/XLA/Pallas) framework for generating
high-resolution 3D radar point clouds with latent diffusion.

Re-implements the full capability surface of the RaLD reference
(radar DSP -> point-cloud VAE -> conditional latent diffusion -> dense
point-cloud decoding + metrics), redesigned for TPU:

- all compute paths are jit-compiled JAX (XLA FFT, MXU matmuls, Pallas
  kernels for the hot ops),
- multi-chip scaling via `jax.sharding.Mesh` + SPMD sharding constraints
  (the reference uses NCCL DDP; here the `data` mesh axis covers it),
- static shapes everywhere (pad-with-mask instead of ragged tensors).

Layer map (mirrors SURVEY.md):
  dsp/        L0  radar signal processing (FFT chain, CFAR, coords)
  data/       L1  datasets, voxelizer, query sampling
  nn/, models/ L2 shared modules + model families
  diffusion/      EDM preconditioning / loss / Heun sampler
  train/, eval/ L3 engines
  dist/       L4  mesh + sharding helpers
  cli/        L5  entry points
"""

__version__ = "0.1.0"
