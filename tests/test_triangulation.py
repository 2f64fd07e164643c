"""Barycentric rasterization vs. matplotlib LinearTriInterpolator — the same
oracle the reference uses to build its maps (warp.py:194-232)."""

import numpy as np
import pytest

from blindshadowremoval_tpu.geometry.landmarks import (
    ANCHOR_POINTS,
    LM_REF,
    UV_TABLE,
)
from blindshadowremoval_tpu.geometry.triangulation import (
    build_triangulation,
    generate_face_region,
    generate_offset_map,
    generate_uv_map,
    rasterize_linear,
)

mtri = pytest.importorskip("matplotlib.tri")


def _mpl_interp(points, values, size):
    """Reference-style interpolation (warp.py:206-211) -> (size,size) array."""
    xi, yi = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
    tri = mtri.Triangulation(points[:, 0], points[:, 1])
    interp = mtri.LinearTriInterpolator(tri, values)
    return np.nan_to_num(np.asarray(interp(xi, yi)))


def test_rasterize_matches_matplotlib(rng):
    pts = rng.uniform(0.05, 0.95, size=(40, 2)).astype(np.float32)
    vals = rng.normal(size=(40, 2)).astype(np.float32)
    tri = build_triangulation(pts)
    ours = np.asarray(rasterize_linear(tri.points, tri.triangles, vals, 64))
    for k in range(2):
        ref = _mpl_interp(pts, vals[:, k], 64)
        # identical topology may differ on co-circular points: compare away
        # from triangle edges by tolerating a small fraction of mismatches
        diff = np.abs(ours[..., k] - ref)
        assert np.mean(diff > 1e-3) < 0.01
        assert np.median(diff) < 1e-5


def test_offset_map_against_reference_formula():
    size = 64
    rng = np.random.default_rng(1)
    lm = LM_REF + rng.normal(scale=0.01, size=LM_REF.shape).astype(np.float32)
    ours = generate_offset_map(lm, LM_REF, size)

    src = np.concatenate([lm, ANCHOR_POINTS], 0)
    tgt = np.concatenate([LM_REF, ANCHOR_POINTS], 0)
    off = src - tgt
    ref_y = _mpl_interp(tgt, off[:, 1], size)
    ref_x = _mpl_interp(tgt, off[:, 0], size)
    assert np.mean(np.abs(ours[..., 0] - ref_y) > 1e-3) < 0.02
    assert np.mean(np.abs(ours[..., 1] - ref_x) > 1e-3) < 0.02
    np.testing.assert_allclose(ours[..., 2], 0, atol=1e-6)


def test_uv_map_against_reference_formula():
    size = 64
    ours = generate_uv_map(LM_REF, size)
    ref_v = _mpl_interp(LM_REF, UV_TABLE[:, 1], size)
    ref_u = _mpl_interp(LM_REF, UV_TABLE[:, 0], size)
    ref_z = _mpl_interp(LM_REF, UV_TABLE[:, 2], size)
    for k, ref in enumerate([ref_v, ref_u, ref_z]):
        assert np.mean(np.abs(ours[..., k] - ref) > 1e-3) < 0.02


def test_identity_offset_map_is_zero():
    out = generate_offset_map(LM_REF, LM_REF, 32)
    np.testing.assert_allclose(out, 0, atol=1e-6)


def test_face_region_shape_and_range():
    mask = generate_face_region(LM_REF, 64)
    assert mask.shape == (64, 64, 1)
    assert mask.min() >= 0 and mask.max() <= 1.0 + 1e-6
    assert mask.max() > 0.9  # face interior present
    assert mask[0, 0, 0] == 0  # corners outside the hull
