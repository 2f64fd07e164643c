"""Regression tests for the driver entry points (`__graft_entry__`).

Round-1 post-mortem: the driver's `dryrun_multichip` FAILED in its
environment because the function touched the default (TPU) backend — via
import-time `jnp.array` module constants and a `jax.devices()` probe —
before falling back to CPU, and the driver's TPU client was version-skewed
and raised on first use.  These tests run the CPU-forcing preamble in a
subprocess whose env *poisons* the default platform, proving the preamble
(and the package imports it precedes) never instantiate a non-CPU backend.
"""

import pytest

pytestmark = pytest.mark.slow   # subprocess dryrun_multichip full-step compile

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FORCE_SCRIPT = """
import __graft_entry__ as g
g._force_cpu_devices(8)

import jax
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()

# the package imports used by dryrun_multichip must not create a backend
# themselves (module-scope constants are numpy, not jnp)
from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.parallel.mesh import make_mesh
from blindshadowremoval_tpu.train.trainer import Trainer

import jax.numpy as jnp
from blindshadowremoval_tpu.ops.image import rgb_to_yuv
from blindshadowremoval_tpu.ops.ssscatter import _SS_WEIGHTS
out = rgb_to_yuv(jnp.ones((2, 2, 3)))
dev, = out.devices()
assert dev.platform == "cpu", dev
print("FORCED-CPU-OK")
"""

_IMPORT_SCRIPT = """
# importing the package with a poisoned platform must not raise: no module
# in the import graph may instantiate a jax backend at import time
import blindshadowremoval_tpu.ops.image
import blindshadowremoval_tpu.ops.ssscatter
import blindshadowremoval_tpu.train.trainer
import blindshadowremoval_tpu.eval.evaluators
import __graft_entry__ as g
g._force_cpu_devices(8)
import jax
assert jax.default_backend() == "cpu", jax.default_backend()
print("IMPORT-OK")
"""


def _run(script: str, platform: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # poison the default platform: "cuda" is not installed in this image, so
    # any code path that creates the default backend before the CPU forcing
    # raises — exactly the round-1 driver failure mode (broken TPU client)
    env["JAX_PLATFORMS"] = platform
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable, "-c", script], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)


def test_force_cpu_survives_poisoned_platform():
    res = _run(_FORCE_SCRIPT, "cuda")
    assert res.returncode == 0, res.stderr
    assert "FORCED-CPU-OK" in res.stdout


def test_package_import_creates_no_backend():
    res = _run(_IMPORT_SCRIPT, "cuda")
    assert res.returncode == 0, res.stderr
    assert "IMPORT-OK" in res.stdout


def test_force_cpu_overrides_explicit_tpu_request():
    # even an explicit JAX_PLATFORMS=tpu (the axon plugin is registered in
    # this image) must be overridden: the dryrun validates sharding
    # semantics on virtual CPU devices regardless of what is plugged in
    res = _run(_FORCE_SCRIPT, "tpu")
    assert res.returncode == 0, res.stderr
    assert "FORCED-CPU-OK" in res.stdout
