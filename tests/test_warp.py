"""Warp kernels vs. the reference's own scipy oracles (warp.py:61-68,118-131)."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import map_coordinates as sp_map_coordinates

from blindshadowremoval_tpu.geometry.warp import (
    batch_map_coordinates,
    batch_map_offsets,
    resize_bilinear,
)


def _oracle_map_coordinates(inputs, coords):
    """sp_batch_map_coordinates (warp.py:61-68) extended to channels."""
    coords = coords.clip(0, inputs.shape[1] - 1)
    out = []
    for inp, coord in zip(inputs, coords):
        chans = [
            sp_map_coordinates(inp[..., k], coord.T, mode="nearest", order=1)
            for k in range(inp.shape[-1])
        ]
        out.append(np.stack(chans, -1))
    return np.stack(out)


def test_map_coordinates_matches_scipy(rng):
    x = rng.uniform(size=(3, 17, 17, 4)).astype(np.float32)
    coords = rng.uniform(-2, 19, size=(3, 50, 2)).astype(np.float32)
    ours = np.asarray(batch_map_coordinates(jnp.asarray(x), jnp.asarray(coords)))
    ref = _oracle_map_coordinates(x, coords)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_map_coordinates_integer_coords_exact(rng):
    x = rng.uniform(size=(1, 8, 8, 2)).astype(np.float32)
    rr, cc = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    coords = np.stack([rr.ravel(), cc.ravel()], -1)[None].astype(np.float32)
    out = np.asarray(batch_map_coordinates(jnp.asarray(x), jnp.asarray(coords)))
    np.testing.assert_allclose(out.reshape(1, 8, 8, 2), x, atol=1e-6)


def test_map_offsets_zero_offset_is_identity(rng):
    x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    off = np.zeros((2, 16, 16, 3), np.float32)
    out = np.asarray(batch_map_offsets(jnp.asarray(x), jnp.asarray(off)))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_map_offsets_matches_oracle(rng):
    """Against sp_batch_map_offsets semantics with same-resolution offsets."""
    b, s, c = 2, 12, 3
    x = rng.uniform(size=(b, s, s, c)).astype(np.float32)
    off_norm = rng.uniform(-0.2, 0.2, size=(b, s, s, 2)).astype(np.float32)

    ours = np.asarray(
        batch_map_offsets(jnp.asarray(x), jnp.asarray(off_norm))
    )

    # oracle: coords = offsets*size + grid, clipped, bilinear (warp.py:118-131)
    grid = np.stack(np.mgrid[:s, :s], -1).reshape(-1, 2).astype(np.float32)
    coords = off_norm.reshape(b, -1, 2) * s + grid[None]
    ref = _oracle_map_coordinates(x, coords).reshape(b, s, s, c)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_map_offsets_resizes_low_res_offsets(rng):
    """Offsets given at a coarser resolution are bilinearly upsampled
    (warp.py:137: tf.image.resize to input size before scaling)."""
    x = rng.uniform(size=(1, 16, 16, 2)).astype(np.float32)
    off = rng.uniform(-0.1, 0.1, size=(1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(batch_map_offsets(jnp.asarray(x), jnp.asarray(off)))
    off_up = np.asarray(resize_bilinear(jnp.asarray(off[..., :2]), (16, 16)))
    out2 = np.asarray(batch_map_offsets(jnp.asarray(x), jnp.asarray(off_up)))
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_resize_bilinear_matches_tf_convention():
    # Half-pixel-centers downsample of a linear ramp keeps the ramp.
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    x = np.broadcast_to(x, (1, 8, 8, 1))
    # TF bilinear (no antialias) samples at half-pixel centers: in[2i+0.5]
    y = np.asarray(resize_bilinear(jnp.asarray(x), (4, 4)))
    np.testing.assert_allclose(y[0, 0, :, 0], [0.5, 2.5, 4.5, 6.5], atol=1e-5)
    # upsample of a 2-px ramp matches TF half-pixel interpolation
    x2 = np.array([[0.0, 1.0]], np.float32).reshape(1, 1, 2, 1)
    y2 = np.asarray(resize_bilinear(jnp.asarray(x2), (1, 4)))
    np.testing.assert_allclose(y2[0, 0, :, 0], [0.0, 0.25, 0.75, 1.0], atol=1e-5)
