"""Test configuration: force a CPU backend with 8 virtual devices.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective tests run against an 8-way host mesh
via ``--xla_force_host_platform_device_count`` so the exact pjit/shard_map
programs that run on a TPU slice compile and execute in CI — the same mesh
size as the driver's ``dryrun_multichip(8)`` gate. (Measured: an 8-device
CPU-mesh psum + sharded grad step completes in <1s on this box; the 40s
collective-rendezvous timeout is not a concern at this scale.)

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, but honors the
``jax_platforms`` config — set it before any backend is initialized.

``RALD_TEST_TPU=1`` opts out of the CPU forcing so kernel differential
tests (tests/test_fused_kernels.py) can run against the real chip:
Mosaic-compiled Pallas programs, not the CPU interpreter. Slower (one
XLA compile per kernel variant) and single-device — run targeted files,
not the whole suite.
"""
import os

_ON_TPU = os.environ.get("RALD_TEST_TPU", "") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == 8, jax.devices()
