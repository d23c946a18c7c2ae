"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
sharded/pjit paths are exercised without TPU hardware."""

import os

# Hard override: the shell may pin JAX_PLATFORMS to a TPU plugin, which
# would route every test compile through a remote service.  A
# sitecustomize may ALREADY have imported jax and registered that
# plugin before this file runs, so mutating os.environ alone is not
# enough — jax.config.update below wins as long as no backend has been
# USED yet (backends initialize lazily on first jax.devices()).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective" not in flags:
    # virtual devices share few physical cores: partitioned programs
    # reach collectives minutes apart, far beyond the 40 s default
    # in-process rendezvous abort
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import pathlib  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8 and \
    jax.devices()[0].platform == "cpu", (
        f"tests require the 8-device virtual CPU mesh, got "
        f"{jax.devices()[:2]} — a pre-imported backend won the race")

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
