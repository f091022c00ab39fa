"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding/multi-chip paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path, and bench.py uses the real chip). The environment's sitecustomize
registers a remote `axon` TPU backend at interpreter startup and pins
jax_platforms to it — running unit tests through that tunnel is ~100x slower
than local CPU, so we override the config back to cpu *before* any backend
initializes (conftest runs before the first jax.devices() call).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
