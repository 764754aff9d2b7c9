"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device code paths without TPU hardware.

The session environment points JAX at a tunneled TPU (JAX_PLATFORMS=axon) and
the plugin overrides the env var, so we must force the platform through
jax.config before any device is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
