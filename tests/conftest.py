"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; per the TPU build's test strategy
(SURVEY.md §4) sharding is validated on a host-platform device mesh. Must run
before the first jax import.
"""

import os

if not os.environ.get("SET_TPU_TESTS"):  # opt-in to run the suite on real TPU
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
