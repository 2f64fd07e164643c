"""Tone-curve jitter and least-squares color-transfer matrices (jittable).

Reference: Schlick bias/gain tone perturbation (`apply_tone_curve`,
utils.py:438-478) and the 3x3 least-squares color-transfer matrix
(`get_ctm_ls`/`apply_ctm`, utils.py:497-527), both host/numpy there — here
pure jnp so shadow synthesis runs on device inside the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def getbias(x: jax.Array, bias: jax.Array) -> jax.Array:
    """Schlick's bias (utils.py:438-440)."""
    return x / ((1.0 / bias - 2.0) * (1.0 - x) + 1.0 + 1e-6)


def apply_tone_curve(image: jax.Array, gain: jax.Array) -> jax.Array:
    """Per-channel Schlick tone jitter of an RGB image (utils.py:442-478).

    image: [H, W, 3] (any non-negative range — internally normalized by its
    max and rescaled, like the reference); gain: [3].
    """
    image_max = jnp.max(image)
    x = image / (image_max + 1e-6)

    up = x > 0.499                               # rgb path threshold (utils.py:463)
    g = gain.reshape((1, 1, 3)).astype(x.dtype)
    lo = getbias(x * 2.0, g) / 2.0
    hi = getbias(x * 2.0 - 1.0, 1.0 - g) / 2.0 + 0.5
    # a true select, NOT the arithmetic blend lo*(1-up)+hi*up: the UNselected
    # branch is evaluated outside its domain (lo at x*2 > 1), where getbias's
    # denominator crosses zero — on TPU the approximate-reciprocal division
    # overflows to inf there and inf * 0 = NaN poisons the blend (observed
    # as whole-step NaN under config.device_darken).  On each branch's
    # SELECTED lanes the denominator is bounded away from 0 for any
    # gain in the sampled [0.2, 0.8], so where() is exact.
    out = jnp.where(up, hi, lo)
    return out * image_max


def get_ctm_ls(image: jax.Array, target: jax.Array) -> jax.Array:
    """3x3 CTM minimizing |image @ C^T - target|_2 (utils.py:497-512).

    Solved via normal equations (A^T A) C = A^T B — a 3x3 solve, far better
    suited to TPU than a tall-skinny SVD lstsq; the reference's
    `np.linalg.lstsq` solution coincides since A has full column rank for
    real images.  Returns C^T transposed the same way as the reference (so
    `apply_ctm` contracts the last axis of the image with the last axis of C).
    """
    a = image.reshape(-1, 3)
    b = target.reshape(-1, 3)
    # HIGHEST precision is load-bearing on TPU: at the default single-bf16
    # matmul pass the 65k-pixel normal-equation accumulation degrades until
    # the 3x3 solve goes singular (NaN losses when this runs inside the
    # bf16 train step under config.device_darken); a 3x3 solve costs nothing
    hi = jax.lax.Precision.HIGHEST
    ata = jnp.matmul(a.T, a, precision=hi)
    atb = jnp.matmul(a.T, b, precision=hi)
    # scale-RELATIVE ridge: a fixed 1e-8 leaves A^T A numerically singular
    # for near-constant crops (rank-1, entries ~1e4 at 256²), and the 3x3
    # solve then emits inf/NaN that poisons a whole training step — the
    # reference's np.linalg.lstsq returns a finite min-norm solution there
    # (utils.py:497-512).  1e-6 of the mean diagonal keeps the solve
    # bounded for any input while perturbing well-posed fits by ~1e-6.
    eps = 1e-6 * (jnp.trace(ata) / 3.0) + 1e-12
    ctm = jnp.linalg.solve(ata + eps * jnp.eye(3, dtype=a.dtype), atb)
    return ctm.T


def apply_ctm(image: jax.Array, ctm: jax.Array) -> jax.Array:
    """Apply a color-transfer matrix to [..., 3] (utils.py:515-527)."""
    return jnp.einsum("...c,kc->...k", image, ctm,
                      precision=jax.lax.Precision.HIGHEST)


def face_darken(key: jax.Array, img: jax.Array,
                tone_sigma: float = 0.3) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Random global color jitter + darkened twin (utils.py:1029-1047).

    Returns (img_aug, img_dark, color_matrix): both outputs are CTM fits of
    independent tone-curve jitters of the input, so `img_dark` differs from
    `img_aug` only by a global 3x3 color transform — the invariant the GSC
    model learns to invert.
    """
    k1, k2 = jax.random.split(key)
    g1 = 0.5 + jax.random.uniform(k1, (3,), minval=-tone_sigma, maxval=tone_sigma)
    img_reclr = apply_tone_curve(img, g1)
    c1 = get_ctm_ls(img, img_reclr)
    img_aug = apply_ctm(img, c1)

    g2 = 0.5 + jax.random.uniform(k2, (3,), minval=-tone_sigma, maxval=tone_sigma)
    img_tone = apply_tone_curve(img, g2)
    c2 = get_ctm_ls(img, img_tone)
    img_dark = apply_ctm(img, c2)
    return img_aug, img_dark, c2
