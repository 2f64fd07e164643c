"""Ops layer: color spaces, filters, perlin, tone/CTM, SS-scattering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blindshadowremoval_tpu.ops.image import (
    adjust_saturation,
    hsv_to_rgb,
    image_gradients,
    psnr,
    resize_nearest,
    rgb_to_grayscale,
    rgb_to_hsv,
    rgb_to_yuv,
    ssim,
)
from blindshadowremoval_tpu.ops.filters import (
    box_blur,
    dilate,
    disc_blur,
    find_edge,
    gaussian_blur,
)
from blindshadowremoval_tpu.ops.perlin import (
    brightness_mask,
    perlin,
    perlin_collection,
    render_perlin_mask,
)
from blindshadowremoval_tpu.ops.tonecurve import (
    apply_ctm,
    apply_tone_curve,
    face_darken,
    get_ctm_ls,
)
from blindshadowremoval_tpu.ops.ssscatter import apply_ss_shadow_map


# ---------------------------------------------------------------- color


def test_grayscale_matches_bt601(rng):
    x = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
    g = np.asarray(rgb_to_grayscale(jnp.asarray(x)))
    ref = x[..., 0] * 0.2989 + x[..., 1] * 0.587 + x[..., 2] * 0.114
    np.testing.assert_allclose(g[..., 0], ref, atol=1e-6)


def test_hsv_roundtrip(rng):
    x = rng.uniform(size=(32, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_hsv_matches_colorsys(rng):
    import colorsys

    x = rng.uniform(size=(20, 3)).astype(np.float32)
    ours = np.asarray(rgb_to_hsv(jnp.asarray(x)))
    for i in range(20):
        h, s, v = colorsys.rgb_to_hsv(*x[i])
        np.testing.assert_allclose(ours[i], [h, s, v], atol=1e-5)


def test_adjust_saturation_identity(rng):
    x = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(adjust_saturation(jnp.asarray(x), jnp.asarray(1.0)))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_yuv_first_channel_is_luma(rng):
    x = rng.uniform(size=(5, 3)).astype(np.float32)
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(x)))
    ref = x @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(yuv[:, 0], ref, atol=1e-6)


def test_image_gradients_tf_semantics():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    dy, dx = image_gradients(img)
    dy, dx = np.asarray(dy), np.asarray(dx)
    assert dy.shape == dx.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(dy[0, :3, :, 0], 4.0)
    np.testing.assert_allclose(dy[0, 3, :, 0], 0.0)     # zero last row
    np.testing.assert_allclose(dx[0, :, :3, 0], 1.0)
    np.testing.assert_allclose(dx[0, :, 3, 0], 0.0)     # zero last col


# ---------------------------------------------------------------- metrics


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.1)
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_identity_and_sensitivity(rng):
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert np.asarray(ssim(x, x)) > 0.9999
    y = jnp.clip(x + 0.2, 0, 1)
    assert np.asarray(ssim(x, y)) < 0.999


def _wang_ssim_numpy(x: np.ndarray, y: np.ndarray, data_range: float = 1.0,
                     sigma: float = 1.5, radius: int = 5) -> float:
    """Vendored pure-numpy Wang-et-al. SSIM oracle (single 2-D image).

    Algorithmically identical to ``skimage.metrics.structural_similarity(
    x, y, data_range, gaussian_weights=True, sigma=1.5,
    use_sample_covariance=False)``: an 11x11 Gaussian window (radius 5 =
    ``int(3.5 * 1.5 + 0.5)``, skimage's truncate=3.5), population (not
    sample) covariance, and the mean over the valid interior only —
    skimage filters with 'nearest' padding then crops ``pad`` pixels, which
    on the remaining interior equals a valid-mode convolution.  Kept inline
    (skimage is not installed here) so the oracle runs everywhere;
    tf.image.ssim — the metric the reference actually calls at
    train_test_GSC.py:724 — shares these exact defaults, making this an
    independent cross-check of ops/image.py:ssim written from the paper,
    not from the implementation under test.
    """
    g = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):
        h, w = img.shape
        k = 2 * radius + 1
        # valid-mode 2-D correlation via an explicit sliding window
        strided = np.lib.stride_tricks.sliding_window_view(img, (k, k))
        return np.einsum("ijkl,kl->ij", strided, win)

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ux, uy = filt(x), filt(y)
    vx = filt(x * x) - ux * ux
    vy = filt(y * y) - uy * uy
    vxy = filt(x * y) - ux * uy
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return float(s.mean())


def test_ssim_matches_wang_oracle(rng):
    x = rng.uniform(size=(48, 48)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(x[None, :, :, None]),
                      jnp.asarray(y[None, :, :, None]))[0])
    ref = _wang_ssim_numpy(x, y, data_range=1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_ssim_oracle_on_structured_image():
    # a second fixture with structure (gradients + edges), not just noise
    xx, yy = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
    x = (0.5 + 0.5 * np.sin(8 * xx) * np.cos(5 * yy)).astype(np.float32)
    y = np.clip(x * 0.9 + 0.05, 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(x[None, :, :, None]),
                      jnp.asarray(y[None, :, :, None]))[0])
    ref = _wang_ssim_numpy(x, y, data_range=1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


# ---------------------------------------------------------------- filters


def test_gaussian_blur_matches_truncated_scipy(rng):
    from scipy import ndimage

    x = rng.uniform(size=(1, 40, 40, 1)).astype(np.float32)
    sigma = 2.3
    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma, max_radius=16))
    ref = ndimage.gaussian_filter(
        x[0, :, :, 0], sigma, mode="reflect",
        truncate=np.ceil(2 * sigma) / sigma)
    # interior only (scipy 'reflect' = TF REFLECT differs by edge convention)
    np.testing.assert_allclose(ours[0, 8:-8, 8:-8, 0], ref[8:-8, 8:-8],
                               atol=2e-3)


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 2)).astype(np.float32))
    y = gaussian_blur(x, 5.0, max_radius=24)
    np.testing.assert_allclose(float(jnp.mean(y)), float(jnp.mean(x)), atol=1e-2)


def test_dilate_is_sliding_max(rng):
    from scipy import ndimage

    x = rng.uniform(size=(1, 20, 20, 1)).astype(np.float32)
    ours = np.asarray(dilate(jnp.asarray(x), 5))
    ref = ndimage.maximum_filter(x[0, :, :, 0], size=5, mode="constant",
                                 cval=-np.inf)
    np.testing.assert_allclose(ours[0, :, :, 0], ref, atol=1e-6)


def test_find_edge_band(rng):
    # The band is the soft penumbra: mean > .01 but min <= .3
    # (utils.py:117) — so the mask must have a soft edge, as the reference's
    # SS-blurred shadow maps do.
    hard = np.zeros((1, 32, 32, 3), np.float32)
    hard[:, 8:24, 8:24, :] = 1.0
    soft = np.asarray(box_blur(jnp.asarray(hard), 5))
    edge = np.asarray(find_edge(jnp.asarray(soft)))
    assert edge.shape == (1, 32, 32, 1)
    assert edge[0, 16, 16, 0] == 0.0      # deep interior not edge
    assert edge[0, 8, 16, 0] == 1.0       # penumbra is edge
    assert edge[0, 0, 0, 0] == 0.0        # far outside not edge
    # a perfectly hard mask has no penumbra -> empty band
    assert np.asarray(find_edge(jnp.asarray(hard))).sum() == 0


def test_disc_blur_normalized_impulse():
    img = np.zeros((33, 33, 1), np.float32)
    img[16, 16, 0] = 1.0
    out = np.asarray(disc_blur(jnp.asarray(img), jnp.asarray(4)))
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-3)
    # energy confined to a disc of radius 4 around (16 - ~1px quirk offset)
    yy, xx = np.mgrid[:33, :33]
    far = ((yy - 16) ** 2 + (xx - 16) ** 2) > 7 ** 2
    assert np.abs(out[..., 0][far]).max() < 1e-4


def test_box_blur_constant_invariant():
    x = jnp.full((1, 16, 16, 1), 0.7)
    np.testing.assert_allclose(np.asarray(box_blur(x, 5)), 0.7, atol=1e-5)


# ---------------------------------------------------------------- perlin


def test_perlin_shape_range_and_determinism():
    key = jax.random.PRNGKey(0)
    a = np.asarray(perlin(key, (64, 64), (4, 4)))
    b = np.asarray(perlin(key, (64, 64), (4, 4)))
    assert a.shape == (64, 64)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a).max() <= np.sqrt(2.0) + 1e-3
    c = np.asarray(perlin(jax.random.PRNGKey(1), (64, 64), (4, 4)))
    assert np.abs(a - c).max() > 0.1


def test_perlin_collection_octaves():
    key = jax.random.PRNGKey(2)
    out = np.asarray(perlin_collection(key, (64, 64), (4, 4), 4,
                                       jnp.asarray(0.5)))
    assert out.shape == (64, 64)
    assert np.isfinite(out).all()


def test_brightness_mask_range():
    m = np.asarray(brightness_mask(jax.random.PRNGKey(3), (64, 64),
                                   min_val=0.5))
    assert m.min() >= 0.0 and m.max() <= 1.0
    assert m.mean() > 0.3


def test_render_perlin_mask():
    m = np.asarray(render_perlin_mask(jax.random.PRNGKey(4), (64, 64)))
    assert m.shape == (64, 64, 1)
    assert 0.0 <= m.min() and m.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(m.max(), 1.0, atol=1e-3)   # max-normalized


# ---------------------------------------------------------------- tone/ctm


def test_ctm_matches_numpy_lstsq(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    tgt = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    ours = np.asarray(get_ctm_ls(jnp.asarray(img), jnp.asarray(tgt)))
    ref = np.linalg.lstsq(img.reshape(-1, 3), tgt.reshape(-1, 3), rcond=None)[0].T
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_apply_ctm_identity(rng):
    img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    out = np.asarray(apply_ctm(jnp.asarray(img), jnp.eye(3)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_tone_curve_neutral_gain_near_identity(rng):
    img = rng.uniform(0.05, 0.95, size=(16, 16, 3)).astype(np.float32)
    out = np.asarray(apply_tone_curve(jnp.asarray(img),
                                      jnp.full((3,), 0.5)))
    np.testing.assert_allclose(out, img, atol=5e-3)


def test_tone_curve_matches_reference_formula(rng):
    def getbias_np(x, bias):
        return x / ((1.0 / bias - 2.0) * (1.0 - x) + 1.0 + 1e-6)

    img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    gain = np.array([0.3, 0.6, 0.8], np.float32)
    ours = np.asarray(apply_tone_curve(jnp.asarray(img), jnp.asarray(gain)))

    imax = img.max()
    x = img / (imax + 1e-6)
    ref = np.empty_like(x)
    for ch in range(3):
        m = (x[..., ch] > 0.499).astype(np.float32)
        ref[..., ch] = (getbias_np(x[..., ch] * 2.0, gain[ch]) / 2.0 * (1 - m)
                        + (getbias_np(x[..., ch] * 2.0 - 1.0, 1.0 - gain[ch])
                           / 2.0 + 0.5) * m)
    np.testing.assert_allclose(ours, ref * imax, atol=1e-5)


def test_face_darken_outputs(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    aug, dark, ctm = face_darken(jax.random.PRNGKey(5), jnp.asarray(img))
    assert aug.shape == dark.shape == (32, 32, 3)
    assert ctm.shape == (3, 3)
    # dark is a global CTM transform of img
    np.testing.assert_allclose(np.asarray(dark),
                               np.asarray(apply_ctm(jnp.asarray(img), ctm)),
                               atol=1e-4)


# ---------------------------------------------------------------- ss


def test_ss_shadow_map():
    mask = np.zeros((64, 64, 1), np.float32)
    mask[20:44, 20:44] = 1.0
    out = np.asarray(apply_ss_shadow_map(jax.random.PRNGKey(6),
                                         jnp.asarray(mask)))
    assert out.shape == (64, 64, 3)
    assert out.max() <= 1.0 + 1e-6
    # red channel bleeds furthest (largest wavelength weights + gain)
    assert out[32, 32, 0] >= out[32, 32, 2]


def test_resize_nearest_half_pixel():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1))
    y = np.asarray(resize_nearest(x, (1, 8)))[0, 0, :, 0]
    np.testing.assert_array_equal(y, [0, 0, 1, 1, 2, 2, 3, 3])


def test_ctm_ls_rank_deficient_stays_finite(rng):
    """A near-constant crop makes A^T A rank-1; the scale-relative ridge
    must keep the 3x3 solve bounded (the reference's np.linalg.lstsq
    returns a finite min-norm solution there, utils.py:497-512)."""
    import jax.numpy as jnp

    from blindshadowremoval_tpu.ops.tonecurve import apply_ctm, get_ctm_ls

    const = np.full((64, 64, 3), 0.37, np.float32)
    target = const * 0.5
    ctm = np.asarray(get_ctm_ls(jnp.asarray(const), jnp.asarray(target)))
    assert np.isfinite(ctm).all()
    out = np.asarray(apply_ctm(jnp.asarray(const), jnp.asarray(ctm)))
    assert np.isfinite(out).all()
    # the fit still maps the constant to its target
    np.testing.assert_allclose(out, target, atol=1e-3)

    # and a well-posed fit is not perturbed: random full-rank image
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    tgt = img * np.array([0.9, 0.7, 0.5], np.float32)
    ctm = get_ctm_ls(jnp.asarray(img), jnp.asarray(tgt))
    fit = np.asarray(apply_ctm(jnp.asarray(img), ctm))
    np.testing.assert_allclose(fit, tgt, atol=1e-3)
