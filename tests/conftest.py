"""Test configuration: force a CPU backend with 4 virtual devices.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective tests run against a 4-way host mesh via
``--xla_force_host_platform_device_count`` so the exact pjit/shard_map
programs that run on a TPU slice compile and execute in CI. (4, not 8: this
box has ONE core; XLA:CPU collectives hard-kill after a 40s rendezvous
timeout, and 8 serialized device programs can exceed it.)

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, but honors the
``jax_platforms`` config — set it before any backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 4, jax.devices()
