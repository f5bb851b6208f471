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
# Persistent compilation cache (works for the CPU backend): measured 2.5-3x
# on repeated full-model compiles, across processes too — the env var form
# propagates to the subprocess tests (multiprocess + graft dryrun).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_cpu_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax  # noqa: E402

# The axon PJRT plugin registers itself from sitecustomize regardless of
# JAX_PLATFORMS; the config knob is the only reliable off-switch.  The same
# early import means the cache env vars above are read too late for THIS
# process (they do reach subprocess tests) — set the config knobs directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
