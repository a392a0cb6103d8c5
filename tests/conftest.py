"""Test configuration: force a CPU backend with 8 virtual devices.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective tests run against an 8-way host mesh
via ``--xla_force_host_platform_device_count`` so the exact pjit/shard_map
programs that run on a TPU slice compile and execute in CI.

The axon TPU plugin ignores ``JAX_PLATFORMS``, so the CPU override is applied
through ``jax_default_device`` after import; mesh-building helpers take the
device list explicitly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
