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

# Fast-tier runtime guard (VERDICT r4 #9): with SDEO_PER_TEST_BUDGET_S
# set, any PASSING non-slow test that exceeds the budget is turned into a
# failure telling you to mark it slow or speed it up. Opt-in via env so
# interactive runs on loaded machines don't flake; CI runs the fast tier
# with the budget on (see pytest.ini).
_BUDGET_S = float(os.environ.get("SDEO_PER_TEST_BUDGET_S", "0"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    rep = outcome.get_result()
    if (
        _BUDGET_S
        and rep.when == "call"
        and rep.passed
        and call.duration > _BUDGET_S
        and item.get_closest_marker("slow") is None
    ):
        rep.outcome = "failed"
        rep.longrepr = (
            f"fast-tier duration budget exceeded: {call.duration:.1f}s > "
            f"SDEO_PER_TEST_BUDGET_S={_BUDGET_S:.0f}s — mark the test "
            "@pytest.mark.slow or make it faster"
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
