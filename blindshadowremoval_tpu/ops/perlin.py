"""Key-driven Perlin noise and the perlin-based shadow/brightness masks.

On-device, PRNG-key-driven re-design of the reference's Perlin stack
(utils.py:777-833, which draws from TF's global RNG): every function takes an
explicit `jax.random` key so masks are reproducible, vmappable over batch and
shardable across devices.  The gradient-lattice algorithm, fade polynomial,
and sqrt(2) scaling match the reference exactly; gradient grids are expanded
with half-pixel-center NEAREST resize like `tf.image.resize(...NEAREST)`
(utils.py:819-822).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.ops.image import resize_nearest


@functools.partial(jax.jit, static_argnames=("size", "reso"))
def perlin(key: jax.Array, size: tuple[int, int],
           reso: tuple[int, int]) -> jax.Array:
    """One octave of Perlin noise -> (H, W) float32 (utils.py:799-833)."""
    h, w = size
    ry, rx = reso
    ysample = jnp.linspace(0.0, ry, h)
    xsample = jnp.linspace(0.0, rx, w)
    # reference: meshgrid(y, x) stacked then transposed -> grid[r, c] =
    # (ysample[r], xsample[c]), taken mod 1
    gy = jnp.broadcast_to(ysample[:, None], (h, w)) % 1.0
    gx = jnp.broadcast_to(xsample[None, :], (h, w)) % 1.0

    fade_y = 6.0 * gy ** 5 - 15.0 * gy ** 4 + 10.0 * gy ** 3
    fade_x = 6.0 * gx ** 5 - 15.0 * gx ** 4 + 10.0 * gx ** 3

    angles = 2.0 * jnp.pi * jax.random.uniform(key, (ry + 1, rx + 1))
    grads = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=2)

    g00 = resize_nearest(grads[0:-1, 0:-1], (h, w))
    g10 = resize_nearest(grads[1:, 0:-1], (h, w))
    g01 = resize_nearest(grads[0:-1, 1:], (h, w))
    g11 = resize_nearest(grads[1:, 1:], (h, w))

    d00 = g00[..., 0] * gy + g00[..., 1] * gx
    d10 = g10[..., 0] * (gy - 1.0) + g10[..., 1] * gx
    d01 = g01[..., 0] * gy + g01[..., 1] * (gx - 1.0)
    d11 = g11[..., 0] * (gy - 1.0) + g11[..., 1] * (gx - 1.0)

    top = d00 * (1.0 - fade_y) + d10 * fade_y
    bot = d01 * (1.0 - fade_y) + d11 * fade_y
    return jnp.sqrt(2.0) * (top * (1.0 - fade_x) + bot * fade_x)


@functools.partial(jax.jit, static_argnames=("size", "reso", "octaves"))
def perlin_collection(key: jax.Array, size: tuple[int, int],
                      reso: tuple[int, int], octaves: int,
                      persistence: jax.Array) -> jax.Array:
    """Multi-octave Perlin (utils.py:777-797): resolution doubles, amplitude
    multiplies by `persistence` (a traced scalar) per octave."""
    noise = jnp.zeros(size, jnp.float32)
    amplitude = jnp.asarray(1.0, jnp.float32)
    ry, rx = reso
    keys = jax.random.split(key, octaves)
    for i in range(octaves):
        noise = noise + amplitude * perlin(keys[i], size, (ry, rx))
        amplitude = amplitude * persistence
        ry, rx = ry * 2, rx * 2
    return noise


@functools.partial(jax.jit, static_argnames=("size",))
def brightness_mask(key: jax.Array, size: tuple[int, int],
                    min_val: float = 0.5) -> jax.Array:
    """Per-pixel intensity variation in [min_val, 1] (utils.py:761-775)."""
    k1, k2 = jax.random.split(key)
    pers = jax.random.uniform(k1, (), minval=0.05, maxval=0.25)
    pm = perlin_collection(k2, size, (2, 2), 2, pers)
    pm = pm / (1.0 / (min_val + 1e-6)) + min_val
    return jnp.minimum(pm, 1.0)


@functools.partial(jax.jit, static_argnames=("size",))
def render_perlin_mask(key: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Perlin shadow mask with random softening -> (H, W, 1) in [0, 1].

    Reference pipeline (utils.py:623-664): threshold multi-octave Perlin at
    0.15, then soften with either spatially-varying pyramid blur (p=0.5,
    _SV_SIGMA) or a random-radius disc blur, then normalize by the max.
    """
    from blindshadowremoval_tpu.ops.filters import disc_blur
    from blindshadowremoval_tpu.ops.svblur import spatially_varying_blur

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    pers = jax.random.uniform(k1, (), minval=0.05, maxval=0.85)
    pm = perlin_collection(k2, size, (4, 4), 4, pers)
    mask = (pm > 0.15).astype(jnp.float32)[..., None]       # (H, W, 1)

    disc_r = jax.random.randint(k3, (), 1, 12)              # _MAX_BLUR_SIGMA=12
    sv_size = jax.random.randint(k4, (), 1, 3)

    blurred = jax.lax.cond(
        jax.random.uniform(k5) > 0.5,                        # _SV_SIGMA = 0.5
        lambda m: spatially_varying_blur(k6, m, sv_size),
        lambda m: disc_blur(m, disc_r),
        mask,
    )
    return blurred / (jnp.max(blurred) + 1e-12)
