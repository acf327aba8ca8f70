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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in _flags:
    # 8 virtual devices share 2 physical cores here: under host load the
    # default 20s/40s all_to_all rendezvous watchdog kills the process
    _flags += (" --xla_cpu_collective_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

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
