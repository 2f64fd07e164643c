"""Spatially-varying blur via a perlin-guided blur pyramid.

Reference: `apply_spatially_varying_blur` / `create_pyramid` /
`apply_pyramid_blend` (utils.py:836-900).  A 3-level pyramid of disc blurs at
radii blur_size * 2^i is blended per pixel by a perlin guidance field, giving
soft shadow penumbras whose width varies across the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.ops.filters import disc_blur
from blindshadowremoval_tpu.ops.perlin import perlin_collection


def spatially_varying_blur(key: jax.Array, image: jax.Array,
                           blur_size: jax.Array) -> jax.Array:
    """image: (H, W, C); blur_size: traced int (reference draws 1..2).

    Pyramid levels use disc radii blur_size * {1, 2, 4} (utils.py:880-900);
    guidance is a single-octave perlin field normalized to [0, num_levels]
    (utils.py:857-878).
    """
    num_levels = 3
    blur_size = jnp.asarray(blur_size, jnp.float32)
    pyramid = [disc_blur(image, blur_size * (2 ** i)) for i in range(num_levels)]

    k1, k2 = jax.random.split(key)
    pers = jax.random.uniform(k1, (), minval=0.05, maxval=0.25)
    guide = perlin_collection(k2, (image.shape[0], image.shape[1]), (2, 2), 1,
                              pers)
    guide = guide - jnp.min(guide)
    guide = guide / (jnp.max(guide) + 1e-12)
    guide = jnp.clip(guide / (1.0 / num_levels), 0.0, float(num_levels))

    recon = pyramid[num_levels - 1]
    for i in range(num_levels - 2, -1, -1):
        alpha = jnp.clip(guide - i, 0.0, 1.0)[..., None]
        recon = pyramid[i] + alpha * (recon - pyramid[i])
    return recon
