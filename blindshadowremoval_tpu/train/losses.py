"""Loss library.

Numerical contracts follow the reference loss stack exactly
(utils.py:22-125, train_test_GSC.py:107-115,287-336):

  * masked losses normalize by the mask sum (plus 1e-6) and channel count;
  * YUV losses use the inline BT.601 matrix and average (y+u+v)/2;
  * HSV uses circular hue via cos(2*pi*h) and averages (h+v)/2;
  * hinge GAN loss is mean(max(0, 1 - y_true * y_pred));
  * the perceptual loss averages |real - fake| over the five VGG
    block*_conv1 taps with unit weights;
  * the multi-scale gradient loss computes (dx+dy)*5 image gradients at
    scales {1,2,4,8,16}, reweights by 1/30/10 (global/shadow/edge) like the
    reconstruction losses, and normalizes by the edge-mask sum.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.geometry.warp import resize_bilinear
from blindshadowremoval_tpu.ops.image import image_gradients, rgb_to_hsv, rgb_to_yuv


def _masked_mean(diff: jax.Array, mask: jax.Array | None,
                 channels: int) -> jax.Array:
    if mask is None:
        return jnp.mean(diff)
    return jnp.sum(diff * mask) / (jnp.sum(mask) + 1e-6) / channels


def l1_loss(x, y, mask=None):
    """utils.py:22-29 (masked variant divides by C)."""
    ch = x.shape[3] if mask is not None else 1
    return _masked_mean(jnp.abs(x - y), mask, ch)


def l2_loss(x, y, mask=None):
    """utils.py:69-75."""
    ch = x.shape[3] if mask is not None else 1
    return _masked_mean((x - y) ** 2, mask, ch)


def _yuv_channel_losses(x, y, mask, sq: bool):
    xyuv = rgb_to_yuv(x)
    yyuv = rgb_to_yuv(y)
    diff = (xyuv - yyuv) ** 2 if sq else jnp.abs(xyuv - yyuv)
    terms = []
    for k in range(3):
        d = diff[..., k:k + 1]
        if mask is not None:
            terms.append(jnp.sum(d * mask) / (jnp.sum(mask) + 1e-6))
        else:
            terms.append(jnp.mean(d))
    return sum(terms) / 2.0


def l1_loss_yuv(x, y, mask=None):
    """utils.py:31-52: per-channel masked L1 in YUV, (y+u+v)/2.

    The mask is single-channel here (the reference multiplies a [B,H,W,3]
    mask against each 1-channel plane; a 3-channel mask gives the same ratio
    since numerator and denominator both triple).
    """
    m = mask[..., :1] if mask is not None else None
    return _yuv_channel_losses(x, y, m, sq=False)


def l2_loss_yuv(x, y, mask=None):
    """utils.py:77-98."""
    m = mask[..., :1] if mask is not None else None
    return _yuv_channel_losses(x, y, m, sq=True)


def l1_loss_hsv(x, y, mask=None):
    """utils.py:54-67: circular hue + value, (h+v)/2.

    NOTE reference quirk preserved: it converts `tf.reverse(x, [-1])` (BGR)
    to HSV — hue is computed on channel-swapped input.  Saturation is
    computed but excluded from the sum.
    """
    pi = math.pi
    hx = rgb_to_hsv(jnp.clip(x[..., ::-1], 0.0, 1.0))
    hy = rgb_to_hsv(jnp.clip(y[..., ::-1], 0.0, 1.0))
    dh = jnp.abs(jnp.cos(2 * pi * hx[..., 0:1]) - jnp.cos(2 * pi * hy[..., 0:1]))
    dv = jnp.abs(hx[..., 2:3] - hy[..., 2:3])
    if mask is not None:
        m = mask[..., :1]
        h_loss = jnp.sum(dh * m) / (jnp.sum(m) + 1e-6)
        v_loss = jnp.sum(dv * m) / (jnp.sum(m) + 1e-6)
    else:
        h_loss = jnp.mean(dh)
        v_loss = jnp.mean(dv)
    return (h_loss + v_loss) / 2.0


def hinge_loss(y_pred, y_true):
    """utils.py:100-102: mean(max(0, 1 - y_true * y_pred))."""
    return jnp.mean(jnp.maximum(0.0, 1.0 - y_true * y_pred))


def style_content_loss(feats: Sequence[jax.Array]) -> jax.Array:
    """utils.py:104-114 given precomputed VGG taps of a real||fake batch."""
    loss = 0.0
    for feat in feats:
        real, fake = jnp.split(feat, 2, axis=0)
        loss = loss + jnp.mean(jnp.abs(real - fake))
    return loss


def style_content_loss_pair(feats_real: Sequence[jax.Array],
                            feats_fake: Sequence[jax.Array]) -> jax.Array:
    """`style_content_loss` with the real/fake taps computed separately.

    Identical numerics (VGG has no cross-batch ops, so taps of a split batch
    equal taps of the concat batch), but lets the trainer run the real half
    under stop_gradient: XLA then skips the VGG backward for real images —
    the concat form pays it even though no gradient flows there.
    """
    loss = 0.0
    for fr, ff in zip(feats_real, feats_fake):
        loss = loss + jnp.mean(jnp.abs(fr - ff))
    return loss


def get_img_grad(img: jax.Array, scale: int = 1) -> jax.Array:
    """(dx + dy) * 5 at a given downscale (train_test_GSC.py:107-115)."""
    b, h, w, c = img.shape
    if scale > 1:
        img = resize_bilinear(img, (h // scale, w // scale))
    dy, dx = image_gradients(img)
    grad = (dx + dy) * 5.0
    if scale > 1:
        grad = resize_bilinear(grad, (h, w))
    return grad


def multi_scale_gradient_loss(pred: jax.Array, gt: jax.Array,
                              mask_bi: jax.Array,
                              mask_edge: jax.Array) -> jax.Array:
    """5-scale reweighted gradient loss (train_test_GSC.py:307-328)."""
    total = 0.0
    for scale in (1, 2, 4, 8, 16):
        d = jnp.abs(get_img_grad(pred, scale) - get_img_grad(gt, scale))
        total = total + jnp.sum((d + 30.0 * d * mask_bi
                                 + 10.0 * d * mask_edge) / 41.0)
    return total / (jnp.sum(mask_edge) + 1e-6)


def reconstruction_losses(gs, rgb, gt, gray_gt, mask_bi, mask_edge):
    """The 1/30/10-reweighted recon pair (train_test_GSC.py:287-301)."""
    recon_gs = (l1_loss(gs, gray_gt)
                + l1_loss(gs, gray_gt, mask_bi) * 30.0
                + l1_loss(gs, gray_gt, mask_edge) * 10.0) / 41.0
    recon_c = (l1_loss(rgb, gt)
               + l1_loss(rgb, gt, mask_bi) * 30.0
               + l1_loss(rgb, gt, mask_edge) * 10.0
               + l1_loss_yuv(rgb, gt)
               + l1_loss_yuv(rgb, gt, mask_bi) * 30.0
               + l1_loss_yuv(rgb, gt, mask_edge) * 10.0) / 82.0
    return recon_gs, recon_c
