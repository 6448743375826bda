"""Test env: force CPU backend with 8 virtual devices BEFORE jax import.

Multi-chip sharding tests run on this virtual mesh (the driver separately
dry-runs the multichip path); numerical parity tests vs torch-cpu run here
too. Real-TPU benchmarking is bench.py's job, not the test suite's.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# via jax.config, overriding the env var — override it back to cpu-only so
# tests run on the 8-device virtual host mesh, not the tunneled TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
