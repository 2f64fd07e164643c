"""Dense bilinear warping on TPU.

Functional contract follows the reference's TF warp library
(`warp.py:71-165` in andrewhou1/BlindShadowRemoval): a warp is specified by a
normalized offset field; sampling is bilinear with clamped coordinates.  The
reference implements this as four `tf.gather_nd` calls over flattened indices;
here it is a single vectorized gather pair expressed so XLA lowers it to
efficient dynamic-slice/gather HLO on TPU, and the whole op is jit/vmap/grad
compatible (the reference version is forward-only in practice).

Coordinate convention (identical to the reference):
  * offsets channel 0 = row (y) delta, channel 1 = column (x) delta, both in
    *normalized* units (fractions of the image side);
  * `batch_map_offsets` resizes the offset field to the input resolution and
    scales by the input side length before sampling (warp.py:134-139);
  * sample coordinates are clamped to `[0, size-1]` (warp.py:85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] bilinear interpolation matrix: half-pixel centers, edge
    clamp, floor/ceil corners — the separable factor of the 2D bilinear
    kernel, identical numerics to a 4-corner gather + lerp."""
    pos = (np.arange(out_size, dtype=np.float64) + 0.5) * (
        in_size / out_size) - 0.5
    pos = np.clip(pos, 0.0, in_size - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.ceil(pos).astype(np.int64)
    f = (pos - lo).astype(np.float32)
    a = np.zeros((out_size, in_size), np.float32)
    a[np.arange(out_size), lo] += 1.0 - f
    a[np.arange(out_size), hi] += f
    return a


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """tf.image.resize(bilinear) equivalent: half-pixel centers, NO antialias.

    Works on [..., H, W, C].  The reference resizes with TF2's default
    bilinear everywhere (e.g. model.py:237, warp.py:137); TF does not blur on
    downsample, unlike `jax.image.resize`, so this samples at half-pixel
    positions with edge clamping.

    TPU-native formulation: axis-aligned bilinear is separable, so the
    resample is two small matmuls with static interpolation matrices
    (out = A_h @ x @ A_w^T) instead of a dynamic gather — the gather lowers
    to slow TPU scatter in the backward pass, while matmul transposes ride
    the MXU (this sits under the multi-scale gradient loss, so its gradient
    is on the training hot path).
    """
    *lead, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    b = 1
    for d in lead:
        b *= d
    xb = x.reshape(b, h, w, c)

    a_h = jnp.asarray(_interp_matrix(oh, h), x.dtype)
    a_w = jnp.asarray(_interp_matrix(ow, w), x.dtype)
    y = jnp.einsum("Oh,bhwc->bOwc", a_h, xb)
    y = jnp.einsum("Pw,bOwc->bOPc", a_w, y)
    return y.reshape(*lead, oh, ow, c)


def _bilinear_gather(x: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Sample `x` [B,H,W,C] at fractional (rows, cols) [B,N] -> [B,N,C].

    Four-corner gather + lerp, matching `tf_batch_map_coordinates`
    (warp.py:86-115): corners are floor/ceil of the *clamped* coordinate, so
    integer coordinates sample exactly.
    """
    b, h, w, c = x.shape
    rows = jnp.clip(rows, 0.0, h - 1.0)
    cols = jnp.clip(cols, 0.0, w - 1.0)

    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    r1 = jnp.ceil(rows)
    c1 = jnp.ceil(cols)
    fr = (rows - r0)[..., None]
    fc = (cols - c0)[..., None]

    flat = x.reshape(b, h * w, c)

    def take(ri, ci):
        idx = (ri.astype(jnp.int32) * w + ci.astype(jnp.int32))[..., None]
        return jnp.take_along_axis(flat, idx, axis=1)

    v00 = take(r0, c0)  # top-left
    v01 = take(r0, c1)
    v10 = take(r1, c0)
    v11 = take(r1, c1)

    top = v00 + (v10 - v00) * fr
    bot = v01 + (v11 - v01) * fr
    return top + (bot - top) * fc


def batch_map_coordinates(x: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample [B,H,W,C] at absolute coords [B,N,2] (row, col) -> [B,N,C].

    JAX analog of `tf_batch_map_coordinates` (warp.py:71-115); unit-testable
    against the reference's own scipy oracle `sp_batch_map_coordinates`
    (warp.py:61-68).
    """
    return _bilinear_gather(x, coords[..., 0], coords[..., 1])


@functools.partial(jax.jit, static_argnames=())
def batch_map_offsets(x: jax.Array, offsets: jax.Array) -> jax.Array:
    """Warp [B,S,S,C] by a normalized offset field [B,s,s,>=2] -> [B,S,S,C].

    JAX analog of `tf_batch_map_offsets` (warp.py:134-165): the offset field is
    bilinearly resized to the input resolution, scaled by the side length, and
    added to the identity grid; only the first two offset channels are used
    (channel 2 of the reference's 3-channel offset maps is zero padding).
    """
    b, s, _, _ = x.shape
    off = offsets[..., :2]
    if off.shape[1] != s or off.shape[2] != s:
        off = resize_bilinear(off, (s, s))
    off = off * jnp.asarray(s, off.dtype)

    grid_r = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    grid_c = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    rows = (off[..., 0] + grid_r).reshape(b, s * s)
    cols = (off[..., 1] + grid_c).reshape(b, s * s)

    out = _bilinear_gather(x, rows, cols)
    return out.reshape(b, s, s, x.shape[-1])
