"""Flax building blocks for the generator/discriminator family.

Functional re-design of the reference's Keras layers (model.py:6-177):
Conv/ConvT combos (conv + BatchNorm/SpectralNorm + LeakyReLU + Dropout),
embedded-Gaussian NonLocal self-attention, and the NonLocal-augmented
ResBottleneck.  TF-semantics details preserved:

  * LeakyReLU slope 0.3 (Keras default, not 0.2);
  * BatchNorm momentum 0.99, epsilon 1e-3 (Keras defaults), running stats
    updated only when `train=True`;
  * glorot-uniform conv kernels, zero biases (Keras defaults);
  * channel-pad residuals when in/out widths differ
    (ResBottleneck, model.py:105-112).

Everything is NHWC; matmul-heavy NonLocal attention runs in the module dtype
(bfloat16 on TPU by default at inference) with float32 softmax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LEAKY_SLOPE = 0.3
_KERNEL_INIT = nn.initializers.glorot_uniform()


class _Int8Conv(nn.Module):
    """Conv with nn.Conv's exact parameter tree, computed via int8 MXU.

    Used for the generator's output head, where int8 measured 2x faster
    than bf16 (small output channels waste MXU lanes; see ops/quant.py).
    Weights stay float in the checkpoint and are quantized per call.
    `static_scale > 0` (a calibrated activation bound) removes the dynamic
    max-reduction so the quantize fuses into the producer (ops/quant.py)."""

    features: int
    ksize: int
    stride: int = 1
    static_scale: float | tuple = 0.0   # scalar, per-channel tuple, or
                                        # <= 0 for dynamic (ops/quant.py)
    int8_channels: Optional[tuple] = None   # split precision: only these
                                        # OUTPUT channels run int8, the
                                        # rest get an exact conv in `dtype`
                                        # (the split-head experiment,
                                        # docs/perf.md "Quality context")
    dtype: Any = jnp.float32            # dtype of the non-int8 channels

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from blindshadowremoval_tpu.ops.quant import int8_conv

        kernel = self.param(
            "kernel", _KERNEL_INIT,
            (self.ksize, self.ksize, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if self.int8_channels is None:
            return int8_conv(x, kernel, bias, stride=self.stride,
                             static_scale=self.static_scale)
        ch8 = list(self.int8_channels)
        rest = [c for c in range(self.features) if c not in ch8]
        y8 = int8_conv(x, kernel[..., ch8], bias[np.asarray(ch8)],
                       stride=self.stride, static_scale=self.static_scale)
        yr = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[..., rest].astype(self.dtype),
            window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias[np.asarray(rest)].astype(self.dtype)
        cols = [None] * self.features
        for j, c in enumerate(ch8):
            cols[c] = y8[..., j:j + 1].astype(self.dtype)
        for j, c in enumerate(rest):
            cols[c] = yr[..., j:j + 1]
        return jnp.concatenate(cols, axis=-1)


def s2d_kernel(kernel: jax.Array) -> jax.Array:
    """[k,k,cin,cout] SAME stride-1 kernel -> [K2,K2,4cin,4cout] VALID
    kernel over 2x2-packed pixels (K2 = (k+1)//2).

    Derivation: with xp = pad(x, k//2) and phases di,pi in {0,1},
    y[2i+di] = sum_kk xp[2i+di+kk] w[kk]; writing di+kk = 2c+pi maps each
    (output-phase, input-phase) pair to a K2-tap kernel w[2c+pi-di]."""
    k, _, cin, cout = kernel.shape
    k2 = (k + 1) // 2
    c = jnp.arange(k2)
    two = jnp.arange(2)
    kk = 2 * c[:, None, None] + two[None, :, None] - two[None, None, :]
    valid = (kk >= 0) & (kk < k)
    kkc = jnp.clip(kk, 0, k - 1)
    wk = kernel[kkc] * valid[..., None, None, None]     # [c,pi,di,l,ci,co]
    wkl = wk[:, :, :, kkc] * valid[None, None, None, ..., None, None]
    # [c,pi,di,d,pj,dj,ci,co] -> [c,d,(pi,pj,ci),(di,dj,co)]
    return wkl.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        k2, k2, 4 * cin, 4 * cout)


def s2d_pack(x: jax.Array, k: int) -> jax.Array:
    """Pad for a SAME odd-k conv and pack 2x2 pixels into channels."""
    b, hh, ww, cin = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h2, w2 = (hh + 2 * pad) // 2, (ww + 2 * pad) // 2
    x2 = xp.reshape(b, h2, 2, w2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    return x2.reshape(b, h2, w2, 4 * cin)


def d2s_unpack(y2: jax.Array, cout: int) -> jax.Array:
    """Inverse of the output packing: [b,h/2,w/2,4cout] -> [b,h,w,cout]."""
    b, oh, ow, _ = y2.shape
    y = y2.reshape(b, oh, ow, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * oh, 2 * ow, cout)


def space_to_depth_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        dtype: Any) -> jax.Array:
    """Stride-1 SAME odd-k conv computed in 2x2 space-to-depth space.

    Numerically the same convolution, but expressed as a VALID K2xK2 conv
    over 2x2-packed pixels: channel counts quadruple, so convs with tiny
    channel counts -- the generator's 7x7 conv1 (3 in) and 7x7 output head
    (2 out) -- stop wasting MXU lanes (3/128 input lanes, 2/128 output
    lanes at bf16).  Identity with the direct conv is asserted in
    tests/test_models.py.
    """
    k, _, cin, cout = kernel.shape
    b, hh, ww, _ = x.shape
    assert k % 2 == 1 and hh % 2 == 0 and ww % 2 == 0
    w2 = s2d_kernel(kernel).astype(dtype)
    x2 = s2d_pack(x, k).astype(dtype)
    y2 = jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return d2s_unpack(y2, cout) + bias.astype(dtype)


class _S2DConv(nn.Module):
    """nn.Conv-compatible parameter tree, computed via space_to_depth_conv."""

    features: int
    ksize: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", _KERNEL_INIT,
            (self.ksize, self.ksize, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return space_to_depth_conv(x, kernel, bias, self.dtype)


class ConvBlock(nn.Module):
    """Conv + optional BatchNorm/SpectralNorm + optional LeakyReLU + Dropout.

    Mirror of `Conv` (model.py:115-147).  `norm` in {'batch', 'spec', None}.
    """

    features: int
    ksize: int = 3
    stride: int = 1
    norm: Optional[str] = "batch"
    act: bool = True
    dropout: bool = False
    quant_int8: bool = False   # serve this conv int8 (see ops/quant.py)
    quant_scale: float | tuple = 0.0   # calibrated static activation
                               # bound(s) for the int8 path: scalar or
                               # per-input-channel tuple (<= 0 = dynamic
                               # per-sample max)
    quant_channels: Optional[tuple] = None   # split precision: int8 only
                               # for these output channels, exact `dtype`
                               # conv for the rest (same parameter tree)
    s2d: bool = False          # compute via 2x2 space-to-depth (lane-starved
                               # stride-1 convs: conv1 / output head)
    fold_bn: bool = False      # serving: BatchNorm folded into the conv's
                               # kernel/bias (models/folding.py) — skip it
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant_int8:
            # identical parameter tree to nn.Conv (Conv_0/{kernel,bias}) so
            # checkpoints interchange between the bf16 and int8 paths
            x = _Int8Conv(self.features, self.ksize, self.stride,
                          static_scale=self.quant_scale,
                          int8_channels=self.quant_channels,
                          dtype=self.dtype,
                          name="Conv_0")(x).astype(self.dtype)
        elif (self.s2d and self.stride == 1 and self.ksize % 2 == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x = _S2DConv(self.features, self.ksize, dtype=self.dtype,
                         name="Conv_0")(x)
        else:
            conv = nn.Conv(self.features, (self.ksize, self.ksize),
                           strides=(self.stride, self.stride), padding="SAME",
                           kernel_init=_KERNEL_INIT, dtype=self.dtype)
            if self.norm == "spec":
                return self._norm_act(
                    nn.SpectralNorm(conv)(x, update_stats=train), train)
            return self._norm_act(conv(x), train)
        return self._norm_act(x, train)

    def _norm_act(self, x: jax.Array, train: bool) -> jax.Array:
        if self.norm == "batch" and not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(x)
        if self.act:
            x = nn.leaky_relu(x, LEAKY_SLOPE)
        if self.dropout:
            x = nn.Dropout(0.3, deterministic=not train)(x)
        return x


class ConvTBlock(nn.Module):
    """Transpose-conv analog of ConvBlock (model.py:149-177)."""

    features: int
    ksize: int = 3
    stride: int = 2
    norm: Optional[str] = "batch"
    act: bool = True
    dropout: bool = False
    fold_bn: bool = False      # serving: BatchNorm folded into the conv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = nn.ConvTranspose(self.features, (self.ksize, self.ksize),
                                strides=(self.stride, self.stride),
                                padding="SAME", kernel_init=_KERNEL_INIT,
                                dtype=self.dtype)
        if self.norm == "spec":
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
        if self.norm == "batch" and not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(x)
        if self.act:
            x = nn.leaky_relu(x, LEAKY_SLOPE)
        if self.dropout:
            x = nn.Dropout(0.3, deterministic=not train)(x)
        return x


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local self-attention (model.py:6-61).

    theta/phi/g are 1x1 convs to ch//2; attention is softmax(theta @ phi^T) @ g
    over all spatial positions; the output 1x1 conv + BatchNorm is added
    residually.  At the generator's 32x32 bottleneck this is a pair of
    1024 x 1024 x 128 matmuls — MXU-friendly; an optional fused Pallas kernel
    lives in ops/pallas/nonlocal_attn.py and is used on TPU for inference.
    """

    ch: int
    out_ch: Optional[int] = None
    use_norm: bool = True
    fold_bn: bool = False      # serving: BatchNorm folded into the `w` conv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out_ch = self.out_ch or self.ch
        b, h, w, _ = x.shape
        half = self.ch // 2

        def conv1x1(feat, name):
            return nn.Conv(feat, (1, 1), padding="SAME", name=name,
                           kernel_init=_KERNEL_INIT, dtype=self.dtype)

        # note: fusing g/phi/theta into one concatenated-kernel matmul was
        # benchmarked at 3848 vs 4050 faces/s — XLA's lowering of the three
        # separate 1x1 convs wins; keep them separate
        g = conv1x1(half, "g")(x).reshape(b, h * w, half)
        phi = conv1x1(half, "phi")(x).reshape(b, h * w, half)
        theta = conv1x1(half, "theta")(x).reshape(b, h * w, half)

        from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (
            fused_nonlocal_attention,
        )

        y = fused_nonlocal_attention(theta, phi, g).reshape(b, h, w, half)

        wy = conv1x1(out_ch, "w")(y)
        if self.use_norm and not self.fold_bn:
            wy = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                              epsilon=1e-3, dtype=self.dtype)(wy)
        return x + wy


def _pad_channels_to_match(x: jax.Array, y: jax.Array):
    """Zero-pad the narrower of x/y on the channel axis (model.py:105-112)."""
    cx, cy = x.shape[-1], y.shape[-1]
    if cx < cy:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, cy - cx),))
    elif cy < cx:
        y = jnp.pad(y, ((0, 0),) * (y.ndim - 1) + ((0, cx - cy),))
    return x, y


class ResBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck + NonLocal + channel-pad residual
    (model.py:81-113)."""

    ch: int
    ksize: int = 3
    stride: int = 1
    fold_bn: bool = False      # serving: BatchNorms folded into the convs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn():
            if self.fold_bn:
                return lambda y: y
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype)

        y = nn.Conv(self.ch // 2, (1, 1), padding="SAME",
                    kernel_init=_KERNEL_INIT, dtype=self.dtype)(x)
        y = nn.leaky_relu(bn()(y), LEAKY_SLOPE)
        y = nn.Conv(self.ch // 2, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride), padding="SAME",
                    kernel_init=_KERNEL_INIT, dtype=self.dtype)(y)
        y = nn.leaky_relu(bn()(y), LEAKY_SLOPE)
        y = nn.Conv(self.ch, (1, 1), padding="SAME",
                    kernel_init=_KERNEL_INIT, dtype=self.dtype)(y)
        y = bn()(y)
        y = NonLocalBlock(self.ch, self.ch, fold_bn=self.fold_bn,
                          dtype=self.dtype)(y, train)
        if self.stride > 1:
            x = nn.Conv(self.ch, (1, 1),
                        strides=(self.stride, self.stride), padding="SAME",
                        kernel_init=_KERNEL_INIT, dtype=self.dtype)(x)
        x, y = _pad_channels_to_match(x, y)
        return nn.leaky_relu(x + y, LEAKY_SLOPE)
