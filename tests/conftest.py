"""Test harness: force JAX onto a virtual 8-device CPU platform.

This is the JAX-native "multi-node without a cluster" mechanism
(``--xla_force_host_platform_device_count``); multi-chip sharding tests run
against this mesh.  Must run before the first ``import jax`` anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon PJRT plugin registers itself from sitecustomize regardless of
# JAX_PLATFORMS; the config knob is the only reliable off-switch.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
