"""Test harness: force an 8-device virtual CPU platform BEFORE any jax use.

This is the JAX-native 'fake backend' for exercising mesh/pjit code without
TPU hardware (SURVEY.md §4). The surrounding environment pre-registers a
real-TPU 'axon' PJRT plugin and forces ``jax_platforms='axon,cpu'`` from
sitecustomize, so the env var alone is not enough — we re-update the jax
config before the backend is initialized.
"""
import os

# must precede backend init
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def jax_devices():
    return jax.devices()
