"""Test configuration: force CPU with 8 virtual devices.

SURVEY.md §4 "Distributed tests without a cluster": multi-device sharding
paths are exercised on a virtual CPU mesh; the axon TPU sim is
experimental, so correctness tests pin the stable CPU backend. This must
run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon sim: tests pin stable CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon sitecustomize calls register(), which sets
# jax.config.jax_platforms = "axon,cpu" programmatically — the env var
# alone doesn't win. Re-pin it before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
