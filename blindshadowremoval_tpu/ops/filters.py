"""Blur / morphology primitives (jittable, static shapes).

TPU-native equivalents of the reference's filter stack:
  * `gaussian_blur` — depthwise separable Gaussian with *runtime* sigma but
    static kernel extent (reference: dynamic-radius `tf.nn.depthwise_conv2d`,
    utils.py:728-759).  XLA requires static shapes, so the kernel is built at
    a fixed max radius and taps beyond ceil(2*sigma) are zeroed, exactly
    reproducing the reference's truncated-and-renormalized kernel.
  * `dilate` — grayscale dilation via `lax.reduce_window` max (reference:
    `tf.nn.dilation2d` with an all-ones kernel, utils.py:120-124; dilation by
    a flat structuring element is a sliding max).
  * `disc_blur` — disc filtering in the frequency domain (reference:
    fft_filter/apply_disc_filter, utils.py:529-621) with runtime radius on a
    static padded plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _depthwise_separable(x: jax.Array, k1d: jax.Array, pad: int,
                         pad_mode: str = "reflect") -> jax.Array:
    """Separable depthwise filter of [B,H,W,C] (rows then cols)."""
    c = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=pad_mode)
    kr = jnp.tile(k1d[:, None, None, None], (1, 1, 1, c))
    kc = jnp.tile(k1d[None, :, None, None], (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(xp, kr, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return jax.lax.conv_general_dilated(y, kc, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


@functools.partial(jax.jit, static_argnames=("max_radius", "pad_mode"))
def gaussian_blur(x: jax.Array, sigma: jax.Array, max_radius: int = 32,
                  pad_mode: str = "reflect") -> jax.Array:
    """Gaussian blur of [B,H,W,C] with traced scalar `sigma`.

    Matches `gaussian_filter` (utils.py:728-759): kernel support is
    [-ceil(2*sigma), ceil(2*sigma)], REFLECT padding, separable depthwise.
    Taps outside the dynamic radius are masked to zero and the kernel is
    renormalized, so the result equals the reference's dynamic-shape kernel
    whenever ceil(2*sigma) <= max_radius.
    """
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    r = jnp.ceil(2.0 * sigma)
    n = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (n / sigma) ** 2)
    k = jnp.where(jnp.abs(n) <= r, k, 0.0)
    k = k / jnp.sum(k)
    return _depthwise_separable(x, k, max_radius, pad_mode)


@functools.partial(jax.jit, static_argnames=("ksize",))
def dilate(x: jax.Array, ksize: int = 5) -> jax.Array:
    """Grayscale dilation of [B,H,W,C] by a flat ksize x ksize element.

    Equivalent to the reference's `tf.nn.dilation2d` with a ones kernel
    followed by `-1` (utils.py:122-124): dilation by ones adds 1 to the
    sliding max, which the reference immediately subtracts — so this returns
    the plain sliding max (no +1/-1 dance needed).
    """
    pad = ksize // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def find_edge(mask: jax.Array, reps: int = 2, ksize: int = 5) -> jax.Array:
    """Shadow-boundary band extractor (utils.py:116-125).

    mask: [B,H,W,C].  Band = (mean over C > .01) minus (min over C > .3),
    dilated `reps` times with a ksize kernel, re-binarized.
    """
    edge = ((jnp.mean(mask, axis=3, keepdims=True) > 0.01).astype(jnp.float32)
            - (jnp.min(mask, axis=3, keepdims=True) > 0.3).astype(jnp.float32))
    for _ in range(reps):
        edge = dilate(edge, ksize)
    return (edge > 0.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_radius",))
def disc_blur(img: jax.Array, radius: jax.Array, max_radius: int = 24) -> jax.Array:
    """Disc (defocus) blur of [H,W,C] with traced integer `radius`.

    FFT-domain convolution with a normalized disc of the given radius
    (utils.py:572-621).  The plane is padded by a static amount so shapes are
    fixed; unlike the reference's bottom/right-only pad (which wraps slightly
    at the border) this pads enough to avoid circular wraparound — interior
    pixels match the reference, the border differs by the wrap artifact.
    """
    h, w, c = img.shape
    radius = jnp.asarray(radius, jnp.float32)
    ph, pw = h + 2 * max_radius + 2, w + 2 * max_radius + 2

    # disc kernel placed with its center at (max_radius, max_radius)
    yy = jnp.arange(ph, dtype=jnp.float32)[:, None] - max_radius
    xx = jnp.arange(pw, dtype=jnp.float32)[None, :] - max_radius
    disc = ((yy ** 2 + xx ** 2) <= radius ** 2).astype(jnp.float32)
    disc = disc / jnp.sum(disc)

    imgp = jnp.pad(img, ((0, ph - h), (0, pw - w), (0, 0)))
    fk = jnp.fft.fft2(disc)
    out = []
    for ch in range(c):
        f = jnp.fft.fft2(imgp[..., ch])
        out.append(jnp.abs(jnp.fft.ifft2(f * fk)).astype(jnp.float32))
    res = jnp.stack(out, axis=-1)
    # center of the disc sat at (max_radius, max_radius): crop there
    return jax.lax.dynamic_slice(res, (max_radius, max_radius, 0), (h, w, c))


def box_blur(x: jax.Array, ksize: int) -> jax.Array:
    """cv2.blur-style normalized box filter of [B,H,W,C]."""
    k = jnp.full((ksize,), 1.0 / ksize, jnp.float32)
    return _depthwise_separable(x, k, ksize // 2, "reflect")
