"""Test harness config: run everything on an 8-device virtual CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Hermetic: force the 8-device virtual CPU mesh even when a real TPU is
# attached. The axon site hook pins jax_platforms at interpreter start, so
# the env var alone is not enough — jax.config.update below wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
