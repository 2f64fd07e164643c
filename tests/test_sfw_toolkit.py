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
    """Drive the tool's own clip path (_holdout_clip_masks, the function
    main() writes sfw-video frames from) and verify coherence by an
    INDEPENDENT computation: recover the frame-0 -> frame-t shift via FFT
    cross-correlation and check it equals the velocity schedule
    (dx, dy) = int(vel * t).  Catches a swapped axis (the recovered shift
    transposes), a dropped per-frame re-seed (kernel/gamma change breaks
    the translation match), or a velocity applied per-step instead of
    per-origin."""
    size = 128
    for seed in (2, 5, 9):
        rng = np.random.default_rng(seed)
        occ = tool._holdout_occluder(rng, size)
        masks, vel = tool._holdout_clip_masks(rng, occ, frames=4)
        for t in (1, 3):
            dx, dy = (vel * t).astype(int)
            expected = np.roll(np.roll(masks[0], dy, axis=0), dx, axis=1)
            # the box blur is shift-invariant away from image borders, so
            # frame t must equal the TRANSLATED frame 0 on the interior
            # (margin = max kernel half-width 16 + |shift| for the
            # reflect-border seam the roll drags along)
            m = 17 + int(np.abs(vel * t).max())
            np.testing.assert_allclose(
                masks[t][m:-m, m:-m], expected[m:-m, m:-m], atol=1e-5,
                err_msg=f"seed={seed} t={t} vel={vel}")
            assert masks[t][m:-m, m:-m].size >= 40 * 40
        # identical softening across the clip: frame 0 and a zero-shift
        # rebuild agree exactly (the per-frame re-seed contract)
        rng2 = np.random.default_rng(seed)
        occ2 = tool._holdout_occluder(rng2, size)
        masks2, _ = tool._holdout_clip_masks(rng2, occ2, frames=1)
        np.testing.assert_array_equal(masks[0], masks2[0])
