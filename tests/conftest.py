"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, hence the env mutation at import
time (pytest imports conftest before test modules import jax).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The bench container's sitecustomize force-registers a remote-TPU PJRT
# backend and sets JAX_PLATFORMS=axon; the config flag wins over the env var,
# so set it explicitly to keep unit tests on the local virtual-8-device CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: most suite wall time is XLA compilation of the
# same step functions; repeat runs hit the disk cache (keyed by HLO hash).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running regression (minutes, not seconds)")


@pytest.fixture
def rng():
    return np.random.RandomState(808)
