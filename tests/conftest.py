"""Test harness: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so sharding paths are
exercised without TPU hardware (SURVEY.md §7 test strategy). Note the
axon sitecustomize registers a TPU backend and overrides JAX_PLATFORMS
before conftest runs, so we must override via jax.config (env vars are
too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the E2E tests are dominated by CPU jit
# compiles of the trainer/tracer while_loops — cache them across test
# sessions (VERDICT r2 weak item 6: suite wall time)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ISOPOINTS_TEST_JAXCACHE",
                                 "/tmp/jaxcache-tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
