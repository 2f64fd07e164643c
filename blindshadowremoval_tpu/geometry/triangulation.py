"""Triangulated landmark interpolation as jittable barycentric rasterization.

The reference builds its UV / offset / face-region maps with matplotlib's
`Triangulation` + `LinearTriInterpolator` on the host CPU per image
(warp.py:194-232, utils.py:255-294) — ~30 such interpolations per test image
dominate its data pipeline.  Here the only host-side step is Delaunay
*topology* extraction (scipy/qhull over ≤85 points, microseconds); the actual
rasterization — find containing triangle, barycentric-weight the per-vertex
values — is a vectorized, jit-compiled device function with static shapes, so
map generation fuses into the preprocessing graph and batches with `vmap`.

Piecewise-linear interpolation over a Delaunay triangulation is identical to
matplotlib's `LinearTriInterpolator`; pixels outside the convex hull produce 0
(the reference's `np.nan_to_num` of the masked interpolant, warp.py:231).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.geometry.landmarks import (
    ANCHOR_POINTS,
    UV_TABLE,
    forehead_points,
)

# Fixed triangle-count pad so rasterization has static shapes regardless of
# the qhull output size (68+16 anchor points yield ~160 triangles).
_MAX_TRIANGLES = 192


@dataclasses.dataclass(frozen=True)
class Triangulation:
    """Host-extracted Delaunay topology over a 2D point set.

    `triangles` is padded to `_MAX_TRIANGLES` with degenerate (-1,-1,-1)
    entries that can never contain a pixel.
    """

    points: np.ndarray     # (P, 2) float32
    triangles: np.ndarray  # (T_max, 3) int32, padded with -1


def build_triangulation(points: np.ndarray) -> Triangulation:
    """Delaunay-triangulate `points` (host side, scipy/qhull)."""
    from scipy.spatial import Delaunay

    points = np.asarray(points, dtype=np.float32)
    simplices = Delaunay(points.astype(np.float64)).simplices.astype(np.int32)
    if simplices.shape[0] > _MAX_TRIANGLES:
        raise ValueError(
            f"{simplices.shape[0]} triangles exceeds pad size {_MAX_TRIANGLES}"
        )
    pad = np.full((_MAX_TRIANGLES - simplices.shape[0], 3), -1, np.int32)
    return Triangulation(points=points, triangles=np.concatenate([simplices, pad]))


@functools.partial(jax.jit, static_argnames=("size",))
def rasterize_linear(
    points: jax.Array,     # (P, 2) in (x, y) normalized coords
    triangles: jax.Array,  # (T, 3) int32, -1 padded
    values: jax.Array,     # (P, K) per-vertex values
    size: int,
) -> jax.Array:
    """Rasterize piecewise-linear interpolation onto a (size, size, K) grid.

    Grid point (r, c) sits at (x, y) = (c, r) / (size - 1), matching the
    reference's `np.meshgrid(np.linspace(0, 1, size), ...)` sampling
    (warp.py:200).  Output is 0 outside the convex hull.
    """
    eps = 1e-7
    s = size
    # pixel coordinates (x = column, y = row), flattened to (N,)
    xs = (jax.lax.broadcasted_iota(jnp.float32, (s, s), 1) / (s - 1)).reshape(-1)
    ys = (jax.lax.broadcasted_iota(jnp.float32, (s, s), 0) / (s - 1)).reshape(-1)

    # Triangle vertex coordinates (T, 3, 2); padded triangles collapse to a
    # far-away degenerate point so no pixel tests inside them.
    valid = triangles[:, 0] >= 0                          # (T,)
    tri_idx = jnp.maximum(triangles, 0)
    tv = points[tri_idx]                                  # (T, 3, 2)

    ax, ay = tv[:, 0, 0], tv[:, 0, 1]
    bx, by = tv[:, 1, 0], tv[:, 1, 1]
    cx, cy = tv[:, 2, 0], tv[:, 2, 1]
    # signed doubled area; qhull emits CCW simplices but guard both signs
    den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)

    def find_triangle(carry, t):
        found_idx = carry
        w0 = ((by[t] - cy[t]) * (xs - cx[t]) + (cx[t] - bx[t]) * (ys - cy[t])) / den[t]
        w1 = ((cy[t] - ay[t]) * (xs - cx[t]) + (ax[t] - cx[t]) * (ys - cy[t])) / den[t]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps) & valid[t]
        found_idx = jnp.where((found_idx < 0) & inside, t, found_idx)
        return found_idx, None

    init = jnp.full((s * s,), -1, jnp.int32)
    tri_of_pixel, _ = jax.lax.scan(
        find_triangle, init, jnp.arange(triangles.shape[0], dtype=jnp.int32)
    )

    hit = tri_of_pixel >= 0
    t = jnp.maximum(tri_of_pixel, 0)
    # recompute barycentric weights for the chosen triangle only
    w0 = ((by[t] - cy[t]) * (xs - cx[t]) + (cx[t] - bx[t]) * (ys - cy[t])) / den[t]
    w1 = ((cy[t] - ay[t]) * (xs - cx[t]) + (ax[t] - cx[t]) * (ys - cy[t])) / den[t]
    w2 = 1.0 - w0 - w1

    vvals = values[tri_idx[t]]                            # (N, 3, K)
    out = (w0[:, None] * vvals[:, 0]
           + w1[:, None] * vvals[:, 1]
           + w2[:, None] * vvals[:, 2])
    out = jnp.where(hit[:, None], out, 0.0)
    return out.reshape(s, s, values.shape[-1])


def _with_anchors(lm: np.ndarray) -> np.ndarray:
    return np.concatenate([np.asarray(lm, np.float32), ANCHOR_POINTS], axis=0)


def _host_cpu():
    """CPU device for the host-facing generate_* wrappers below (the jitted
    rasterizer/blurs also run in-graph via device_geometry_maps)."""
    from blindshadowremoval_tpu.utils.hostdev import host_cpu_device

    return host_cpu_device()


def generate_offset_map(source_lm, target_lm, size: int) -> np.ndarray:
    """Offset field warping `target` geometry onto `source` geometry.

    Reference contract (warp.py:194-213): append the 16 border anchors to both
    landmark sets, triangulate the *target* positions, interpolate the
    per-landmark delta (source - target); output channels are
    (row delta, col delta, 0) in normalized units.
    """
    src = _with_anchors(source_lm)
    tgt = _with_anchors(target_lm)
    tri = build_triangulation(tgt)
    delta = src - tgt                                    # (P, 2) in (x, y)
    values = np.stack([delta[:, 1], delta[:, 0], np.zeros_like(delta[:, 0])], 1)
    with jax.default_device(_host_cpu()):
        return np.asarray(
            rasterize_linear(tri.points, tri.triangles, values, size))


def generate_uv_map(lm, size: int, uv_table: np.ndarray = UV_TABLE) -> np.ndarray:
    """Canonical face-UV map from landmarks (warp.py:215-232).

    Triangulates the 68 landmarks only (no anchors), so the map is 0 outside
    the face hull; channels are (v, u, z) matching the reference's
    (y-interp, x-interp, z-interp) stacking order.
    """
    lm = np.asarray(lm, np.float32)
    tri = build_triangulation(lm)
    values = np.stack([uv_table[:, 1], uv_table[:, 0], uv_table[:, 2]], 1)
    with jax.default_device(_host_cpu()):
        return np.asarray(
            rasterize_linear(tri.points, tri.triangles, values, size))


def generate_face_region(lm, size: int, fold: float = 0.8,
                         blur: bool = True) -> np.ndarray:
    """Soft face-region mask: convex hull of jaw + reflected forehead points.

    Reference contract (utils.py:255-276): extend the 68 landmarks with the
    jawline reflected upward (fold=0.8), rasterize hull membership, then 5x5
    Gaussian blur.  Returns (size, size, 1) float32 in [0, 1].
    """
    lm = np.asarray(lm, np.float32)
    pts = np.concatenate([lm, forehead_points(lm, fold)], axis=0)
    tri = build_triangulation(pts)
    ones = np.ones((pts.shape[0], 1), np.float32)
    with jax.default_device(_host_cpu()):
        mask = np.asarray(
            rasterize_linear(tri.points, tri.triangles, ones, size))
        mask = (mask > 0).astype(np.float32)
        if blur:
            mask = np.asarray(_gauss5(jnp.asarray(mask[None]))[0])
    return mask


def generate_face_region2(lm, size: int) -> np.ndarray:
    """Box-blurred, max-normalized face region (utils.py:278-294, fold=0.6)."""
    lm = np.asarray(lm, np.float32)
    pts = np.concatenate([lm, forehead_points(lm, 0.6)], axis=0)
    tri = build_triangulation(pts)
    ones = np.ones((pts.shape[0], 1), np.float32)
    with jax.default_device(_host_cpu()):
        mask = np.asarray(
            rasterize_linear(tri.points, tri.triangles, ones, size))
        mask = (mask > 0).astype(np.float32)
        mask = np.asarray(_box45(jnp.asarray(mask[None]))[0])
    return mask / (mask.max() + 1e-6)


@functools.lru_cache(maxsize=1)
def _reg_in_static() -> tuple[np.ndarray, np.ndarray]:
    """Canonical-target geometry for reg_in maps: LM_REF+anchors points and
    their (static) Delaunay topology."""
    from blindshadowremoval_tpu.geometry.landmarks import LM_REF

    pts = _with_anchors(LM_REF)
    return pts, build_triangulation(pts).triangles


_UV_VALUES = np.stack(
    [UV_TABLE[:, 1], UV_TABLE[:, 0], UV_TABLE[:, 2]], 1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("size",))
def device_geometry_maps(lm: jax.Array, face_pts: jax.Array,
                         uv_tris: jax.Array, face_tris: jax.Array,
                         reg_tris: jax.Array, size: int) -> dict:
    """All per-view geometry maps rasterized in-graph (batched).

    The TPU-native alternative to calling the host generate_* wrappers per
    sample: the data pipeline ships only landmarks and Delaunay topologies
    (microseconds of qhull on ≤85 points) and the maps fuse into the train
    step.  Inputs: lm [B,68,2] normalized, face_pts [B,85,2] (lm + forehead
    reflection), uv_tris/face_tris/reg_tris [B,T,3] int32 (-1 padded;
    reg_tris triangulates lm+anchors).  Returns {"uv" [B,S,S,3],
    "reg" [B,S,S,6] (reg_in ∥ reg_out), "face" [B,S,S,1]} — numerically
    identical to generate_uv_map / generate_offset_map / generate_face_region.
    """
    b = lm.shape[0]
    ref_pts_np, ref_tris_np = _reg_in_static()
    ref_pts = jnp.asarray(ref_pts_np)
    ref_tris = jnp.asarray(ref_tris_np)
    anchors = jnp.broadcast_to(jnp.asarray(ANCHOR_POINTS),
                               (b,) + ANCHOR_POINTS.shape)
    lm_anch = jnp.concatenate([lm, anchors], axis=1)          # (B, 84, 2)

    def stack_vals(delta):
        zero = jnp.zeros_like(delta[..., :1])
        return jnp.concatenate(
            [delta[..., 1:2], delta[..., 0:1], zero], axis=-1)

    rast = jax.vmap(
        functools.partial(rasterize_linear, size=size),
        in_axes=(0, 0, 0))

    uv_vals = jnp.broadcast_to(jnp.asarray(_UV_VALUES),
                               (b,) + _UV_VALUES.shape)
    uv = rast(lm, uv_tris, uv_vals)

    # reg_in: target = canonical (static topology), values = lm - ref
    ref_b = jnp.broadcast_to(ref_pts, (b,) + ref_pts.shape)
    reg_in = rast(ref_b, jnp.broadcast_to(ref_tris, (b,) + ref_tris.shape),
                  stack_vals(lm_anch - ref_pts))
    # reg_out: target = per-sample landmarks, values = ref - lm
    reg_out = rast(lm_anch, reg_tris, stack_vals(ref_pts - lm_anch))

    ones = jnp.ones((b, face_pts.shape[1], 1), jnp.float32)
    face = rast(face_pts, face_tris, ones)
    face = _gauss5((face > 0).astype(jnp.float32))

    return {"uv": uv,
            "reg": jnp.concatenate([reg_in, reg_out], axis=-1),
            "face": face}


@jax.jit
def _gauss5(x: jax.Array) -> jax.Array:
    """5x5 Gaussian blur with OpenCV's sigma-from-ksize convention (sigma=1.1)."""
    n = jnp.arange(-2, 3, dtype=jnp.float32)
    sigma = 0.3 * ((5 - 1) * 0.5 - 1) + 0.8
    k = jnp.exp(-0.5 * (n / sigma) ** 2)
    k = k / k.sum()
    return _separable(x, k, k, pad_mode="edge")


@jax.jit
def _box45(x: jax.Array) -> jax.Array:
    """45x45 box blur (cv2.blur) with edge ("reflect101"-approx) padding."""
    k = jnp.full((45,), 1.0 / 45.0, jnp.float32)
    return _separable(x, k, k, pad_mode="reflect_101")


def _separable(x: jax.Array, kr: jax.Array, kc: jax.Array, pad_mode: str) -> jax.Array:
    """Apply a separable filter along H then W of [B,H,W,C]."""
    rr = kr.shape[0] // 2
    rc = kc.shape[0] // 2
    if pad_mode == "reflect_101":
        mode = "reflect"
    else:
        mode = "edge"
    xp = jnp.pad(x, ((0, 0), (rr, rr), (0, 0), (0, 0)), mode=mode)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (rc, rc), (0, 0)), mode=mode)
    c = x.shape[-1]
    kern_r = jnp.tile(kr[:, None, None, None], (1, 1, 1, c))   # (K,1,1,C) HWIO
    kern_c = jnp.tile(kc[None, :, None, None], (1, 1, 1, c))   # (1,K,1,C)
    y = jax.lax.conv_general_dilated(
        xp, kern_r, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    y = jax.lax.conv_general_dilated(
        y, kern_c, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return y
