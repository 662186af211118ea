"""Test harness: force an 8-device virtual CPU platform BEFORE jax import.

This is the JAX-native 'fake backend' for exercising mesh/pjit code without
TPU hardware (SURVEY.md §4). Must run before any module imports jax.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic-ish and fast on CPU test runs.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
