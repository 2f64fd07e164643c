"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this image initializes jax's backend eagerly at
interpreter startup (before any conftest), so setting JAX_PLATFORMS is not
enough — the backend must be explicitly reset to CPU.  Multi-chip sharding
tests (`tests/test_sharding.py`) rely on the 8 virtual CPU devices, per the
multi-device test strategy in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax.extend import backend as _jeb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    _jeb.clear_backends()
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
