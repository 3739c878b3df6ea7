"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 implication).

Note: in this environment the JAX_PLATFORMS env var is overridden by the
TPU plugin, so we must use jax.config.update before the backend
initialises.
"""

import os

# Must be set before jax initialises a backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite re-jits many tiny detectors; caching
# across runs (and across test modules in one run) cuts wall time several-fold.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
