"""Test config: force an 8-device virtual CPU mesh.

This is the JAX analog of a fake multi-chip cluster: sharding/pjit tests
run against 8 host devices so the full multi-chip code path is exercised
without TPU hardware.

Note: the session's sitecustomize pre-imports jax with the TPU tunnel
platform pinned, so plain env vars are too late — we must go through
jax.config before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: model-graph compiles dominate test runtime
jax.config.update("jax_compilation_cache_dir", "/tmp/hnt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(10)
