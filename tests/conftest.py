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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process and the compiler eventually segfaults (reproducible at suite
    scale only; any half of the suite passes). Clearing per module keeps the
    process comfortably under the pathological state at the cost of
    recompiling cross-module helpers."""
    yield
    jax.clear_caches()
