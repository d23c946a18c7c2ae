"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
sharded/pjit paths are exercised without TPU hardware."""

import os

# Hard override: the shell may pin JAX_PLATFORMS=axon (the TPU tunnel),
# which would route every test compile through the remote service.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache: the DP-scan kernels are compile-heavy; cache
# across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
