"""Numerical parity vs TensorFlow — the reference's own substrate.

These tests run the actual TF ops the reference calls (tf.image.ssim, psnr,
rgb_to_grayscale, adjust_saturation, resize, image_gradients, dilation2d)
against our JAX implementations on shared inputs.  TF import is slow (~25 s),
so everything shares one module-scoped fixture; deselect with
`-k 'not tf_parity'` for quick runs.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # imports TensorFlow for op-level oracles

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from blindshadowremoval_tpu.geometry.warp import resize_bilinear  # noqa: E402
from blindshadowremoval_tpu.ops.filters import dilate  # noqa: E402
from blindshadowremoval_tpu.ops.image import (  # noqa: E402
    adjust_saturation,
    image_gradients,
    psnr,
    resize_nearest,
    rgb_to_grayscale,
    rgb_to_hsv,
    ssim,
)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(7)
    a = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.08, size=a.shape), 0, 1).astype(np.float32)
    return a, b


def test_tf_parity_grayscale(imgs):
    a, _ = imgs
    ref = tf.image.rgb_to_grayscale(a).numpy()
    ours = np.asarray(rgb_to_grayscale(jnp.asarray(a)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tf_parity_psnr_ssim(imgs):
    a, b = imgs
    ref_psnr = tf.image.psnr(a, b, max_val=1.0).numpy()
    ref_ssim = tf.image.ssim(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(np.asarray(psnr(jnp.asarray(a), jnp.asarray(b))),
                               ref_psnr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssim(jnp.asarray(a), jnp.asarray(b))),
                               ref_ssim, atol=2e-4)


def test_ssim_bounded_on_quantized_pairs(imgs):
    """SSIM must stay in [-1, 1] even for uint8-quantized predictions vs
    smooth gt with flat windows.  Regression guard for a real failure: on
    TPU the default conv precision runs the SSIM filters through bf16
    passes, the variance cancellation `E[x²]-E[x]²` picks up ~1e-3 error,
    and windows where `va+vb ≈ -c2` explode the contrast denominator
    (observed whole-image "SSIM" of 35.8 on a real eval pair).  Fixed by
    precision=HIGHEST in _filter2d_valid plus clamping the variances at 0."""
    rng = np.random.default_rng(3)
    gt = np.clip(0.97 + rng.normal(scale=0.005, size=(1, 256, 256, 3)),
                 0, 1).astype(np.float32)
    pred = (np.round(np.clip(
        0.58 + rng.normal(scale=0.01, size=gt.shape), 0, 1) * 255.0)
        / 255.0).astype(np.float32)
    # zero-padded corner, as produced by the eval resize-into-box
    gt[:, 200:, 200:] = 0.0
    pred[:, 200:, 200:] = 0.0
    s = np.asarray(ssim(jnp.asarray(gt), jnp.asarray(pred)))
    assert np.all(s >= -1.0 - 1e-4) and np.all(s <= 1.0 + 1e-4), s


def test_tf_parity_hsv(imgs):
    a, _ = imgs
    ref = tf.image.rgb_to_hsv(a).numpy()
    ours = np.asarray(rgb_to_hsv(jnp.asarray(a)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tf_parity_adjust_saturation(imgs):
    a, _ = imgs
    for factor in (0.5, 1.7):
        ref = tf.image.adjust_saturation(a, factor).numpy()
        ours = np.asarray(adjust_saturation(jnp.asarray(a), factor))
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_tf_parity_resize_bilinear(imgs):
    a, _ = imgs
    for size in ((32, 32), (128, 128), (20, 50)):
        ref = tf.image.resize(a, size).numpy()
        ours = np.asarray(resize_bilinear(jnp.asarray(a), size))
        np.testing.assert_allclose(ours, ref, atol=1e-4,
                                   err_msg=f"size={size}")


def test_tf_parity_resize_nearest(imgs):
    a, _ = imgs
    for size in ((32, 32), (90, 17)):
        ref = tf.image.resize(a, size, method="nearest").numpy()
        ours = np.asarray(resize_nearest(jnp.asarray(a), size))
        np.testing.assert_allclose(ours, ref, atol=0, err_msg=f"size={size}")


def test_tf_parity_image_gradients(imgs):
    a, _ = imgs
    ref_dy, ref_dx = tf.image.image_gradients(tf.constant(a))
    dy, dx = image_gradients(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(dy), ref_dy.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), ref_dx.numpy(), atol=1e-6)


def test_tf_parity_dilation(imgs):
    a, _ = imgs
    x = a[..., :1]
    kernel = tf.ones((5, 5, 1))
    ref = tf.nn.dilation2d(x, kernel, [1, 1, 1, 1], "SAME", "NHWC",
                           [1, 1, 1, 1]).numpy() - 1.0
    ours = np.asarray(dilate(jnp.asarray(x), 5))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ---------------------------------------------------------------- losses
# The reference's loss formulas re-expressed in TF in-line (utils.py:22-125,
# train_test_GSC.py:107-115) vs our jnp implementations on shared tensors.


def test_tf_parity_masked_l1(imgs):
    from blindshadowremoval_tpu.train.losses import l1_loss

    a, b = imgs
    mask = (a > 0.5).astype(np.float32)
    ref = (tf.reduce_sum(tf.abs(a - b) * mask)
           / (tf.reduce_sum(mask) + 1e-6) / a.shape[3]).numpy()
    ours = float(l1_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_tf_parity_l1_yuv(imgs):
    from blindshadowremoval_tpu.train.losses import l1_loss_yuv

    a, b = imgs
    mask = (a[..., :1] > 0.5).astype(np.float32)

    def yuv(x):
        r, g, bl = tf.split(x, 3, axis=3)
        y = r * .299 + g * .587 + bl * .114
        u = r * -.168736 + g * -.331264 + bl * .5
        v = r * .5 + g * -.418688 + bl * -.081312
        return y, u, v

    ya, ua, va = yuv(tf.constant(a))
    yb, ub, vb = yuv(tf.constant(b))
    terms = []
    for pa, pb in ((ya, yb), (ua, ub), (va, vb)):
        terms.append(tf.reduce_sum(tf.abs(pa - pb) * mask)
                     / (tf.reduce_sum(mask) + 1e-6))
    ref = (sum(terms) / 2).numpy()
    ours = float(l1_loss_yuv(jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_tf_parity_l1_hsv(imgs):
    import math

    from blindshadowremoval_tpu.train.losses import l1_loss_hsv

    a, b = imgs
    pi = math.pi
    ha = tf.image.rgb_to_hsv(tf.reverse(tf.constant(a), axis=[-1]))
    hb = tf.image.rgb_to_hsv(tf.reverse(tf.constant(b), axis=[-1]))
    h_loss = tf.reduce_mean(tf.abs(tf.cos(2 * pi * ha[..., 0])
                                   - tf.cos(2 * pi * hb[..., 0])))
    v_loss = tf.reduce_mean(tf.abs(ha[..., 2] - hb[..., 2]))
    ref = ((h_loss + v_loss) / 2).numpy()
    ours = float(l1_loss_hsv(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tf_parity_find_edge(imgs):
    from blindshadowremoval_tpu.ops.filters import find_edge

    a, _ = imgs
    mask = tf.constant(np.repeat(
        (a[..., :1] > 0.4).astype(np.float32), 3, axis=3))
    mask = tf.nn.avg_pool2d(mask, 5, 1, "SAME")   # soften
    edge = (tf.cast(tf.reduce_mean(mask, 3, keepdims=True) > .01, tf.float32)
            - tf.cast(tf.reduce_min(mask, 3, keepdims=True) > .3, tf.float32))
    kernel = tf.ones((5, 5, 1))
    for _ in range(2):
        edge = tf.nn.dilation2d(edge, kernel, [1, 1, 1, 1], "SAME", "NHWC",
                                [1, 1, 1, 1]) - 1.0
    ref = tf.cast(edge > 0., tf.float32).numpy()
    ours = np.asarray(find_edge(jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_tf_parity_grad_loss(imgs):
    from blindshadowremoval_tpu.train.losses import get_img_grad

    a, _ = imgs
    for scale in (1, 2, 4):
        x = tf.constant(a)
        if scale > 1:
            x = tf.image.resize(x, [64 // scale, 64 // scale])
        gy, gx = tf.image.image_gradients(x)
        g = (gx + gy) * 5
        if scale > 1:
            g = tf.image.resize(g, [64, 64])
        ours = np.asarray(get_img_grad(jnp.asarray(a), scale))
        np.testing.assert_allclose(ours, g.numpy(), atol=1e-4,
                                   err_msg=f"scale={scale}")
