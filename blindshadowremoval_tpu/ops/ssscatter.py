"""Subsurface-scattering shadow softening (NVIDIA skin model).

Reference: `wavelength_filter` / `apply_ss_shadow_map` (utils.py:667-726),
the image-space subsurface-scattering approximation from NVIDIA's
Advanced Skin rendering (GDC'07 slide 98): a 6-level sum of Gaussian blurs
with wavelength-dependent per-level RGB weights, turning a hard binary
shadow into a red-bleeding soft skin shadow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.ops.filters import gaussian_blur

_MAX_SS_SIGMA = 15.0     # utils.py:16

# (sigma multiplier, r weight, g weight, b weight) per level (utils.py:695-700)
# numpy on purpose: a module-scope jnp.array would instantiate a jax backend
# at import time, which breaks backend selection for downstream importers
# (e.g. __graft_entry__.dryrun_multichip must force CPU before first use).
_SS_WEIGHTS = np.array(
    [[0.042, 0.220, 0.437, 0.635],
     [0.220, 0.101, 0.355, 0.365],
     [0.433, 0.119, 0.208, 0.000],
     [0.753, 0.114, 0.000, 0.000],
     [1.412, 0.364, 0.000, 0.000],
     [2.722, 0.080, 0.000, 0.000]], jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_lv", "max_radius"))
def wavelength_filter(key: jax.Array, img: jax.Array, scale: jax.Array,
                      num_lv: int = 6, max_radius: int = 96) -> jax.Array:
    """Grayscale (H, W, 1) -> wavelength-blurred (H, W, 3).

    Mirrors the is_rgb=False path of the reference (utils.py:703-726): each
    level Gaussian-blurs the input with sigma = weight * scale, and the red
    channel carries an extra random gain in [1.1, 1.5].
    """
    out = jnp.zeros((img.shape[0], img.shape[1], 3), jnp.float32)
    keys = jax.random.split(key, num_lv)
    # static per-level radii: level lv's sigma is at most
    # mult_lv * _MAX_SS_SIGMA, so taps beyond 3 sigma of that bound are ~0 —
    # sizing each level's kernel to its own bound (instead of the global
    # max) cuts the depthwise-conv work ~2.5x with identical numerics
    mults = (0.042, 0.220, 0.433, 0.753, 1.412, 2.722)
    for lv in range(num_lv):
        sigma = _SS_WEIGHTS[lv, 0] * scale
        r_lv = min(max_radius,
                   max(2, int(3.0 * mults[min(lv, 5)] * _MAX_SS_SIGMA) + 1))
        blur = gaussian_blur(img[None], sigma, max_radius=r_lv)[0]
        rgain = jax.random.uniform(keys[lv], (), minval=1.1, maxval=1.5)
        level = jnp.concatenate(
            [blur * _SS_WEIGHTS[lv, 1] * rgain,
             blur * _SS_WEIGHTS[lv, 2],
             blur * _SS_WEIGHTS[lv, 3]], axis=-1)
        out = out + level
    return out


@jax.jit
def apply_ss_shadow_map(key: jax.Array, mask: jax.Array) -> jax.Array:
    """Shadow mask (H, W, 1) -> subsurface-scattered lit-region map (H, W, 3).

    Reference (utils.py:667-678): random global blur scale in
    [1, _MAX_SS_SIGMA), then /0.6 normalization clamped at 1.
    """
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (), minval=1.0, maxval=_MAX_SS_SIGMA)
    sm = wavelength_filter(k2, mask, r)
    return jnp.minimum(1.0, sm / 0.6)
