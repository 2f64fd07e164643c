"""GSC (grayscale shadow consistency) generator.

Flax re-design of the reference two-stage generator (model.py:198-290):

  encoder:  7x7 conv (32) -> three stride-2 convs (64, 64, 96), 256 -> 32 px
  shared:   UV map concatenated at the 32x32 bottleneck, then 3
            NonLocal-augmented ResBottlenecks at 257 channels
  GS head:  3 up-convs with skip connections from the encoder; per-pixel gain
            `mask = tanh(conv)` and offset `con`:
            gs = gray(input) * (1 + mask) + con
  RGB head: a stop-gradient binary shadow mask from the grayscale difference
            gates feature "holes"; 3 more ResBottlenecks; 3 up-convs; 3 final
            convs conditioned on `gs` produce the recolored output.

Returns (gs, con_rgb, mask22, dif):
  gs      [B,H,W,1] deshadowed grayscale
  con_rgb [B,H,W,3] deshadowed RGB
  mask22  [B,H,W,3] gain visualization (relu(mask), 0, relu(-mask))
  dif     [B,H,W,1] gray(con_rgb) - gray(input) — the shadow-probability map
          every evaluator consumes as `mask_pred` (train_test_GSC.py:422).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from blindshadowremoval_tpu.geometry.warp import resize_bilinear
from blindshadowremoval_tpu.models.blocks import ConvBlock, ConvTBlock, ResBottleneck
from blindshadowremoval_tpu.ops.image import rgb_to_grayscale

# encoder/decoder widths (model.py:201)
N_CH = (32, 64, 64, 96, 128, 256, 256)


class GSCGenerator(nn.Module):
    """Two-stage grayscale-then-RGB deshadowing generator."""

    n_res: int = 6
    remat: bool = False   # rematerialize ResBottlenecks (trade FLOPs for HBM)
    int8_head: bool = False   # serve the 7x7 output head int8 (2x faster;
                              # see ops/quant.py for the measurement)
    int8_head_scale: float | tuple = 0.0  # calibrated static activation
                              # bound(s) for the int8 head: a per-channel
                              # tuple (ops/calibration.py derives one from
                              # the checkpoint), a scalar, or <= 0 for the
                              # dynamic per-sample max.  A static bound lets
                              # the quantize fuse into the producing fusion
                              # (ops/quant.py)
    int8_head_split: bool = False   # split precision: only the offset
                              # (`con`) channel runs int8; the tanh-gain
                              # channel that feeds the dif>0.1 hole
                              # binarization stays in `dtype`.  The
                              # measured experiment from docs/perf.md
                              # "Quality context" — see the numbers there
    s2d_convs: bool = False   # space-to-depth 7x7 convs — measured slower
                              # on v5e (see config.py); off by default
    fold_bn: bool = False     # serving: every BatchNorm is folded into its
                              # conv's kernel/bias — apply with
                              # models/folding.py:fold_batch_norm(variables)
    dtype: Any = jnp.float32
    egress_dtype: Any = jnp.float32   # dtype of the returned images; bf16
                              # for serving halves the output HBM writes
                              # (the f32 default preserves the evaluators'
                              # TF-parity numerics)

    @nn.compact
    def __call__(self, inputs: jax.Array, uv: jax.Array,
                 reg: jax.Array | None = None, *, train: bool = False):
        del reg  # accepted for API parity; the GSC variant has no ShareLayer
        x = inputs.astype(self.dtype)

        # ---- encoder -------------------------------------------------
        x1 = ConvBlock(N_CH[0], ksize=7, s2d=self.s2d_convs,
                       fold_bn=self.fold_bn, dtype=self.dtype, name="conv1")(x, train)
        x2 = ConvBlock(N_CH[1], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down1")(x1, train)
        x3 = ConvBlock(N_CH[2], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down2")(x2, train)
        x = ConvBlock(N_CH[3], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down3")(x3, train)
        _, h, w, _ = x.shape

        # ---- bottleneck with UV conditioning ------------------------
        uv_small = resize_bilinear(uv.astype(self.dtype), (h, w))
        x = jnp.concatenate([x, uv_small], axis=3)
        res_cls = (nn.remat(ResBottleneck, static_argnums=(2,))
                   if self.remat else ResBottleneck)
        for i in range(self.n_res // 2):
            x = res_cls(N_CH[5] + 1, fold_bn=self.fold_bn, dtype=self.dtype,
                              name=f"res{i}")(x, train)

        # ---- grayscale head -----------------------------------------
        y = ConvTBlock(N_CH[3], fold_bn=self.fold_bn, dtype=self.dtype, name="up1")(x, train)
        y = ConvTBlock(N_CH[2], fold_bn=self.fold_bn, dtype=self.dtype, name="up2")(
            jnp.concatenate([y, x3], axis=3), train)
        y = ConvTBlock(N_CH[1], fold_bn=self.fold_bn, dtype=self.dtype, name="up3")(
            jnp.concatenate([y, x2], axis=3), train)
        # conv2 (tanh gain) and conv3 (offset) fused into one 2-channel head:
        # a 7x7 conv with 1 output channel costs the same as with 2 on the
        # MXU, so the merge halves the most expensive op in the model (the
        # TF bridge maps generator/conv{2,3} into slices of this kernel).
        head = ConvBlock(2, ksize=7, norm=None, act=False,
                         quant_int8=self.int8_head or self.int8_head_split,
                         s2d=self.s2d_convs,
                         quant_scale=self.int8_head_scale,
                         # channel 1 is `con`; channel 0 (the tanh gain
                         # feeding dif) stays exact under the split
                         quant_channels=((1,) if self.int8_head_split
                                         else None),
                         fold_bn=self.fold_bn, dtype=self.dtype, name="head")(y, train)
        mask = jnp.tanh(head[..., 0:1])
        con = head[..., 1:2]

        gray_in = rgb_to_grayscale(inputs.astype(jnp.float32)).astype(self.dtype)
        gs = gray_in * (1.0 + mask) + con
        dif = gs - gray_in
        mask22 = jnp.concatenate(
            [nn.relu(mask), mask * 0.0, nn.relu(-mask)], axis=3)

        # ---- RGB head ------------------------------------------------
        # stop-gradient binary shadow mask at bottleneck res (model.py:256)
        bmask = (jax.lax.stop_gradient(
            resize_bilinear(dif.astype(jnp.float32), (h, w))) > 0.1
        ).astype(self.dtype)
        x_hole = x * (1.0 - bmask)
        x = jnp.concatenate([x_hole, bmask, uv_small], axis=3)
        for i in range(self.n_res // 2, self.n_res):
            x = res_cls(N_CH[5] + 1, fold_bn=self.fold_bn, dtype=self.dtype,
                              name=f"res{i}")(x, train)

        f = ConvTBlock(N_CH[4], fold_bn=self.fold_bn, dtype=self.dtype, name="clr_up1")(x, train)
        f = ConvTBlock(N_CH[3], fold_bn=self.fold_bn, dtype=self.dtype, name="clr_up2")(f, train)
        f = ConvTBlock(N_CH[2], fold_bn=self.fold_bn, dtype=self.dtype, name="clr_up3")(f, train)
        con_rgb = ConvBlock(16, ksize=3, fold_bn=self.fold_bn, dtype=self.dtype, name="clr_conv1")(
            jnp.concatenate([gs, f], axis=3), train)
        con_rgb = ConvBlock(16, ksize=1, fold_bn=self.fold_bn, dtype=self.dtype,
                            name="clr_conv2")(con_rgb, train)
        con_rgb = ConvBlock(3, ksize=1, norm=None, act=False,
                            fold_bn=self.fold_bn, dtype=self.dtype, name="clr_conv3")(con_rgb, train)

        et = self.egress_dtype
        dif_out = (rgb_to_grayscale(con_rgb.astype(et))
                   - rgb_to_grayscale(inputs.astype(et)))
        return (gs.astype(et), con_rgb.astype(et),
                mask22.astype(et), dif_out.astype(et))
