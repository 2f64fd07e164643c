"""RGB-only ablation generator.

Re-design of `model_RGB.py` (the reference's single-branch ablation): same
encoder, doubled up-conv widths (up1/2/3 at 2x), wider ResBottlenecks
(2*256+1 channels), and a direct 3-channel output `con` — no grayscale
branch, no mask, no hole gating.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from blindshadowremoval_tpu.geometry.warp import resize_bilinear
from blindshadowremoval_tpu.models.blocks import ConvBlock, ConvTBlock, ResBottleneck
from blindshadowremoval_tpu.models.generator import N_CH


class RGBGenerator(nn.Module):
    """Single-branch direct-RGB deshadowing generator (model_RGB.py)."""

    n_res: int = 6
    remat: bool = False   # rematerialize ResBottlenecks (trade FLOPs for HBM)
    s2d_convs: bool = False   # space-to-depth 7x7 convs (see generator.py)
    fold_bn: bool = False     # serving: BatchNorms folded into the convs
                              # (models/folding.py; see generator.py)
    dtype: Any = jnp.float32
    egress_dtype: Any = jnp.float32   # output-image dtype (see generator.py)

    @nn.compact
    def __call__(self, inputs: jax.Array, uv: jax.Array,
                 reg: jax.Array | None = None, *, train: bool = False):
        del reg
        x = inputs.astype(self.dtype)

        x1 = ConvBlock(N_CH[0], ksize=7, s2d=self.s2d_convs,
                       fold_bn=self.fold_bn, dtype=self.dtype, name="conv1")(x, train)
        x2 = ConvBlock(N_CH[1], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down1")(x1, train)
        x3 = ConvBlock(N_CH[2], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down2")(x2, train)
        x = ConvBlock(N_CH[3], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down3")(x3, train)
        _, h, w, _ = x.shape

        uv_small = resize_bilinear(uv.astype(self.dtype), (h, w))
        x = jnp.concatenate([x, uv_small], axis=3)
        res_cls = (nn.remat(ResBottleneck, static_argnums=(2,))
                   if self.remat else ResBottleneck)
        for i in range(self.n_res // 2):
            x = res_cls(N_CH[5] * 2 + 1, fold_bn=self.fold_bn, dtype=self.dtype,
                              name=f"res{i}")(x, train)

        y = ConvTBlock(N_CH[3] * 2, fold_bn=self.fold_bn, dtype=self.dtype, name="up1")(x, train)
        y = ConvTBlock(N_CH[2] * 2, fold_bn=self.fold_bn, dtype=self.dtype, name="up2")(
            jnp.concatenate([y, x3], axis=3), train)
        y = ConvTBlock(N_CH[1] * 2, fold_bn=self.fold_bn, dtype=self.dtype, name="up3")(
            jnp.concatenate([y, x2], axis=3), train)
        y = ConvBlock(3, ksize=7, norm=None, act=False, s2d=self.s2d_convs,
                      fold_bn=self.fold_bn, dtype=self.dtype, name="conv2")(y, train)
        con = ConvBlock(3, ksize=7, norm=None, act=False, s2d=self.s2d_convs,
                        fold_bn=self.fold_bn, dtype=self.dtype, name="conv3")(y, train)
        return con.astype(self.egress_dtype)
