"""Color-space conversions, gradients, and image metrics (jittable).

Numerical conventions follow the TF ops the reference relies on so losses and
metrics are comparable: `tf.image.rgb_to_grayscale` ITU-R 601 weights,
`tf.image.image_gradients` forward differences with zero last row/column
(used by the multi-scale gradient loss, train_test_GSC.py:107-115), and
`tf.image.ssim` defaults (11-tap Gaussian sigma=1.5, k1=0.01, k2=0.03;
metrics at train_test_GSC.py:724-725).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights used by tf.image.rgb_to_grayscale.
_GRAY_W = (0.2989, 0.5870, 0.1140)

# BT.601 YUV matrix rows as inlined by the reference (utils.py:38-43).
# numpy on purpose: a module-scope jnp.array would instantiate a jax backend
# at import time, which breaks backend selection for downstream importers
# (e.g. __graft_entry__.dryrun_multichip must force CPU before first use).
_YUV = np.array(
    [[0.299000, 0.587000, 0.114000],
     [-0.168736, -0.331264, 0.500000],
     [0.500000, -0.418688, -0.081312]], np.float32)


def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 1] luma."""
    w = jnp.asarray(_GRAY_W, x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def rgb_to_yuv(x: jax.Array) -> jax.Array:
    """[..., 3] RGB -> YUV with the reference's inline matrix."""
    return jnp.einsum("...c,kc->...k", x, _YUV.astype(x.dtype))


def rgb_to_hsv(x: jax.Array) -> jax.Array:
    """tf.image.rgb_to_hsv equivalent; input in [0, 1], h in [0, 1]."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    rc = (mx - r) / safe
    gc = (mx - g) / safe
    bc = (mx - b) / safe
    h = jnp.where(mx == r, bc - gc,
                  jnp.where(mx == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(diff > 0, h, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(x: jax.Array) -> jax.Array:
    """tf.image.hsv_to_rgb equivalent."""
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # 6-way sextant select as elementwise where-chains: jnp.choose lowers to
    # a per-pixel gather from a stacked [6,...] array, which runs at ~1.6 GB/s
    # on TPU (gathers bypass the VPU) and measured 18 ms per call at
    # 16x256x256 — 52% of the whole train step.  jnp.select is pure VPU.
    def pick(opts):
        return jnp.select([i == k for k in range(5)], opts[:5], opts[5])

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_saturation(x: jax.Array, factor: jax.Array) -> jax.Array:
    """tf.image.adjust_saturation: scale S in HSV space, clip to [0, 1]."""
    hsv = rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    s = jnp.clip(hsv[..., 1] * factor, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))


def random_saturation(key: jax.Array, x: jax.Array,
                      lower: float = 0.5, upper: float = 2.0) -> jax.Array:
    """tf.image.random_saturation(lower, upper) (train_test_GSC.py:229)."""
    f = jax.random.uniform(key, (), minval=lower, maxval=upper)
    return adjust_saturation(x, f)


def image_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """tf.image.image_gradients: forward diffs, zero-padded at the far edge.

    img: [B, H, W, C] -> (dy, dx), each [B, H, W, C].
    """
    dy = img[:, 1:, :, :] - img[:, :-1, :, :]
    dx = img[:, :, 1:, :] - img[:, :, :-1, :]
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dy, dx


def flip_left_right(x: jax.Array) -> jax.Array:
    """Horizontal flip of [..., H, W, C]."""
    return jnp.flip(x, axis=-2)


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """tf.image.psnr over [..., H, W, C] -> [...] (dB)."""
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _ssim_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    n = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (n / sigma) ** 2)
    k = k / jnp.sum(k)
    return k


def _filter2d_valid(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable VALID filter of [B, H, W, C] with a 1D kernel both axes.

    precision=HIGHEST: on TPU the default precision runs f32 convs through
    bf16 multiply passes, and SSIM's variance `E[x²] - E[x]²` is a
    catastrophic cancellation — bf16 filter error (~1e-3) can push
    `va + vb` to ≈ -c2 (-9e-4), where the contrast term's denominator
    crosses zero and single windows explode to ~1e6 (observed on real
    eval pairs: whole-image "SSIM" of 35.8)."""
    c = x.shape[-1]
    kr = jnp.tile(k1d[:, None, None, None], (1, 1, 1, c))
    kc = jnp.tile(k1d[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(x, kr, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(y, kc, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c,
                                        precision=jax.lax.Precision.HIGHEST)


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """tf.image.ssim defaults: 11x11 Gaussian sigma=1.5, k1=.01, k2=.03.

    a, b: [..., H, W, C] -> [...] mean SSIM.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lead = a.shape[:-3]
    ab = a.reshape((-1,) + a.shape[-3:])
    bb = b.reshape((-1,) + b.shape[-3:])
    k = _ssim_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_a = _filter2d_valid(ab, k)
    mu_b = _filter2d_valid(bb, k)
    aa = _filter2d_valid(ab * ab, k)
    bbm = _filter2d_valid(bb * bb, k)
    abm = _filter2d_valid(ab * bb, k)

    # exact variances are >= 0; clamp the cancellation residue so the cs
    # denominator can never cross zero even under reduced-precision filters
    va = jnp.maximum(aa - mu_a * mu_a, 0.0)
    vb = jnp.maximum(bbm - mu_b * mu_b, 0.0)
    cov = abm - mu_a * mu_b

    lum = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * cov + c2) / (va + vb + c2)
    out = jnp.mean(lum * cs, axis=(1, 2, 3))
    return out.reshape(lead)


@functools.lru_cache(maxsize=64)
def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] one-hot selection matrix for NEAREST resize (half-pixel
    centers) — axis-aligned nearest resize as two small matmuls rides the
    MXU, where the equivalent constant-index gather lowers to slow TPU
    gather ops (this sits under every perlin octave)."""
    idx = np.floor((np.arange(out_size) + 0.5) * (in_size / out_size))
    idx = np.clip(idx.astype(np.int64), 0, in_size - 1)
    a = np.zeros((out_size, in_size), np.float32)
    a[np.arange(out_size), idx] = 1.0
    return a


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """tf.image.resize NEAREST with half-pixel centers, [..., H, W, C]."""
    *lead, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    b = 1
    for d in lead:
        b *= d
    xb = x.reshape(b, h, w, c)
    a_h = jnp.asarray(_nearest_matrix(oh, h), x.dtype)
    a_w = jnp.asarray(_nearest_matrix(ow, w), x.dtype)
    y = jnp.einsum("Oh,bhwc->bOwc", a_h, xb)
    y = jnp.einsum("Pw,bOwc->bOPc", a_w, y)
    return y.reshape(*lead, oh, ow, c)
