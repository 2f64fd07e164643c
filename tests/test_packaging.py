"""Installability smoke tests (the framework must be a real package:
`pip install -e .`, console entry points, native source shipped as package
data — not a sys.path-bootstrapped source tree)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_declares_package_and_scripts():
    try:
        import tomllib
    except ImportError:          # pragma: no cover (py<3.11)
        import tomli as tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "blindshadowremoval-tpu"
    assert "bsr" in proj["scripts"]
    # the console scripts must point at a real callable
    mod, fn = proj["scripts"]["bsr"].split(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), fn))
    # deps are pinned with floors
    assert any(d.startswith("jax>=") for d in proj["dependencies"])


def test_version_matches_pyproject():
    try:
        import tomllib
    except ImportError:          # pragma: no cover
        import tomli as tomllib
    import blindshadowremoval_tpu as pkg

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert pkg.__version__ == meta["project"]["version"]


def test_native_source_ships_inside_the_package():
    """native/loader.cc must live under the package (declared package-data)
    so non-editable installs can still build the ctypes loader; and the
    loader must degrade to numpy cleanly when the build is impossible."""
    import blindshadowremoval_tpu
    from blindshadowremoval_tpu.utils import native

    pkg_dir = os.path.dirname(blindshadowremoval_tpu.__file__)
    assert os.path.isfile(os.path.join(pkg_dir, "native", "loader.cc"))
    assert native._SRC.startswith(pkg_dir)


def test_console_entry_point_registered_when_installed():
    """With `pip install -e .` done (the README quickstart), the `bsr`
    entry point resolves through importlib.metadata."""
    from importlib import metadata

    try:
        eps = metadata.entry_points(group="console_scripts")
    except TypeError:            # pragma: no cover (py<3.10 select API)
        eps = metadata.entry_points()["console_scripts"]
    names = {e.name for e in eps}
    if "bsr" not in names:
        import pytest

        pytest.skip("package not pip-installed in this environment")
    (ep,) = [e for e in eps if e.name == "bsr"]
    assert ep.value == "blindshadowremoval_tpu.cli:main"


def test_cli_help_runs_as_module(tmp_path):
    """`python -m blindshadowremoval_tpu --help` must work from any cwd
    (no repo-root bootstrap requirement)."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "-m", "blindshadowremoval_tpu", "--help"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120)
    assert r.returncode == 0, r.stderr
    assert "train" in r.stdout and "ucb" in r.stdout
