"""Test harness config: force an 8-device virtual CPU platform so distributed /
sharding paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: this image's sitecustomize imports jax at interpreter start and registers the
'axon' TPU-tunnel backend, so setting JAX_PLATFORMS in os.environ here is too late —
we must go through jax.config. XLA_FLAGS is still read lazily at first CPU-client
init, so the host-device-count flag works from here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (jax is already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow')")
