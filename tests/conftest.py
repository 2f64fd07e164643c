"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes so multi-chip sharding tests
(`tests/test_sharding.py`) see 8 devices, per the multi-device test strategy
in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
