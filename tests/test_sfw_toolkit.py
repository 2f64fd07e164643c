"""Held-out SFW shadow family (tools/make_sfw_eval_set.py --holdout):
the occluder/softening generators must stay disjoint-from-training in the
ways the docs claim (shapes, blur range, gamma warp) and numerically sane.
Pure numpy — no jax compile."""

import importlib.util
import os

import numpy as np
import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "make_sfw_eval_set.py")


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("make_sfw_eval_set", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_holdout_occluder_is_binary_and_structured(tool):
    rng = np.random.default_rng(0)
    saw_stripes = saw_polygon = False
    for _ in range(12):
        m = tool._holdout_occluder(rng, 128)
        assert m.shape == (128, 128) and m.dtype == np.float32
        vals = np.unique(m)
        assert set(vals.tolist()) <= {0.0, 1.0}          # hard shapes pre-blur
        cover = m.mean()
        assert 0.0 < cover < 1.0
        # stripes have many connected runs per row; polygons are one blob
        runs = int((np.abs(np.diff(m, axis=1)) > 0).sum())
        if runs > 4 * 128:
            saw_stripes = True
        elif runs > 0:
            saw_polygon = True
    assert saw_stripes and saw_polygon      # both family members appear


def test_soften_holdout_blur_and_gamma(tool):
    rng = np.random.default_rng(1)
    hard = np.zeros((128, 128), np.float32)
    hard[:, 64:] = 1.0
    soft = tool._soften_holdout(rng, hard)
    assert soft.shape == hard.shape
    assert float(soft.min()) >= 0.0 and float(soft.max()) <= 1.0
    # the 21-31 px box blur must create a penumbra band ≥ 10 px wide
    mid = soft[64]
    band = int(((mid > 0.05) & (mid < 0.95)).sum())
    assert band >= 10
    # deterministic per rng state (the tool fixes one seed per clip so
    # every frame of a clip gets the identical softening)
    soft2 = tool._soften_holdout(np.random.default_rng(1), hard)
    np.testing.assert_array_equal(soft, soft2)


def test_holdout_motion_is_temporally_coherent(tool):
    """The clip path rolls one fixed occluder at a per-clip velocity: two
    frames must be exact translations of each other (what makes the
    sfw-video input a real 'video')."""
    rng = np.random.default_rng(2)
    occ = tool._holdout_occluder(rng, 64)
    vel = np.array([3.0, -2.0])
    f0 = np.roll(np.roll(occ, 0, axis=0), 0, axis=1)
    dx, dy = (vel * 4).astype(int)
    f4 = np.roll(np.roll(occ, dy, axis=0), dx, axis=1)
    np.testing.assert_array_equal(np.roll(np.roll(f0, dy, 0), dx, 1), f4)
