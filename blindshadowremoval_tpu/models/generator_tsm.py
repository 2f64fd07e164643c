"""TSM (temporal sharing module) generator for video / multi-view inputs.

Re-design of `model_with_TSM.py:199-325`.  The ShareLayer warps features into
canonical face space (via the reg_in offset field), reduces max+mean across
the frame axis, broadcasts the pooled statistics back to every frame, and
unwarps (reg_out).  That cross-frame reduction is this framework's
sequence-parallel seam (SURVEY.md §2c): when frames are sharded over a
`frame` mesh axis, the same layer reduces with `lax.pmax`/`lax.pmean`
collectives instead of an in-core reshape — N frames across N chips cost two
all-reduces per forward (the layer is applied twice:
model_with_TSM.py:271,293).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from blindshadowremoval_tpu.geometry.warp import batch_map_offsets, resize_bilinear
from blindshadowremoval_tpu.models.blocks import ConvBlock, ConvTBlock, ResBottleneck
from blindshadowremoval_tpu.models.generator import N_CH
from blindshadowremoval_tpu.ops.image import rgb_to_grayscale


class ShareLayer(nn.Module):
    """Cross-frame max+mean pooling in canonical face space.

    Local mode (`axis_name=None`): input [G*F, h, w, c] is grouped into G
    groups of F frames and reduced over the frame dim in-core
    (model_with_TSM.py:204-229).

    Collective mode (`axis_name='frame'`): each device holds a slice of the
    frame axis; the reduction composes the in-core reduce with
    `lax.pmax`/`lax.pmean` over the mesh axis, so results are identical to
    gathering all frames on one chip.
    """

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, reg: jax.Array, frame: int,
                 share: bool | jax.Array = True) -> jax.Array:
        def passthrough(x, reg):
            # keeps the channel contract (model_with_TSM.py:227)
            return jnp.concatenate([x, x], axis=3)

        def shared(x, reg):
            reg_in, reg_out = jnp.split(reg, 2, axis=3)
            x_reg = batch_map_offsets(x, reg_in)
            gf, h, w, c = x_reg.shape
            grouped = x_reg.reshape(gf // frame, frame, h, w, c)
            x_max = jnp.max(grouped, axis=1)
            x_mean = jnp.mean(grouped, axis=1)
            if self.axis_name is not None:
                x_max = jax.lax.pmax(x_max, self.axis_name)
                x_mean = jax.lax.pmean(x_mean, self.axis_name)
            x_share = jnp.concatenate([x_max, x_mean], axis=3)
            x_share = jnp.broadcast_to(
                x_share[:, None], (gf // frame, frame, h, w, 2 * c)
            ).reshape(gf, h, w, 2 * c)
            # the f32 offset field promotes the warp to f32; cast back so
            # both cond branches (and the downstream convs) keep the compute
            # dtype — bf16 TSM training hit a lax.cond branch-dtype mismatch
            # here, and the static share=True path silently ran everything
            # after the first ShareLayer in f32
            return batch_map_offsets(x_share, reg_out).astype(x.dtype)

        if isinstance(share, bool):             # static gate
            return shared(x, reg) if share else passthrough(x, reg)
        # traced gate — the TSM trainer randomizes `share` per step
        # (train_with_TSM.py:218-221), mirroring the reference's tf.cond
        return jax.lax.cond(share, shared, passthrough, x, reg)


class TSMGenerator(nn.Module):
    """GSC generator + two ShareLayer insertions (model_with_TSM.py:261-325)."""

    n_res: int = 6
    axis_name: Optional[str] = None
    remat: bool = False   # rematerialize ResBottlenecks (trade FLOPs for HBM)
    int8_head: bool = False   # serve the 7x7 output head int8 (see generator.py)
    int8_head_scale: float | tuple = 0.0  # static bound(s) (see generator.py)
    s2d_convs: bool = False   # space-to-depth 7x7 convs (see generator.py)
    fold_bn: bool = False     # serving: BatchNorms folded into the convs
                              # (models/folding.py; see generator.py)
    dtype: Any = jnp.float32
    egress_dtype: Any = jnp.float32   # output-image dtype (see generator.py)

    @nn.compact
    def __call__(self, inputs: jax.Array, uv: jax.Array, reg: jax.Array, *,
                 frame: int = 1, share: bool = True, train: bool = False):
        x = inputs.astype(self.dtype)

        x1 = ConvBlock(N_CH[0], ksize=7, s2d=self.s2d_convs,
                       fold_bn=self.fold_bn, dtype=self.dtype, name="conv1")(x, train)
        x2 = ConvBlock(N_CH[1], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down1")(x1, train)
        x3 = ConvBlock(N_CH[2], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down2")(x2, train)
        x = ConvBlock(N_CH[3], stride=2, fold_bn=self.fold_bn, dtype=self.dtype, name="down3")(x3, train)
        _, h, w, _ = x.shape

        uv_small = resize_bilinear(uv.astype(self.dtype), (h, w))
        share_layer = ShareLayer(axis_name=self.axis_name, name="info_share")
        x_share = share_layer(x, reg, frame, share)
        x = jnp.concatenate([x, x_share, uv_small], axis=3)
        res_cls = (nn.remat(ResBottleneck, static_argnums=(2,))
                   if self.remat else ResBottleneck)
        for i in range(self.n_res // 2):
            x = res_cls(N_CH[5] + 1, fold_bn=self.fold_bn, dtype=self.dtype,
                              name=f"res{i}")(x, train)

        y = ConvTBlock(N_CH[3], fold_bn=self.fold_bn, dtype=self.dtype, name="up1")(x, train)
        y = ConvTBlock(N_CH[2], fold_bn=self.fold_bn, dtype=self.dtype, name="up2")(
            jnp.concatenate([y, x3], axis=3), train)
        y = ConvTBlock(N_CH[1], fold_bn=self.fold_bn, dtype=self.dtype, name="up3")(
            jnp.concatenate([y, x2], axis=3), train)
        # conv2/conv3 heads fused into one 2-channel conv (see generator.py)
        head = ConvBlock(2, ksize=7, norm=None, act=False,
                         quant_int8=self.int8_head, s2d=self.s2d_convs,
                         quant_scale=self.int8_head_scale,
                         fold_bn=self.fold_bn, dtype=self.dtype, name="head")(y, train)
        mask = jnp.tanh(head[..., 0:1])
        con = head[..., 1:2]

        gray_in = rgb_to_grayscale(inputs.astype(jnp.float32)).astype(self.dtype)
        gs = gray_in * (1.0 + mask) + con
        dif = gs - gray_in
        mask22 = jnp.concatenate(
            [nn.relu(mask), mask * 0.0, nn.relu(-mask)], axis=3)

        bmask = (jax.lax.stop_gradient(
            resize_bilinear(dif.astype(jnp.float32), (h, w))) > 0.1
        ).astype(self.dtype)
        x_hole = x * (1.0 - bmask)
        x_share = share_layer(x_hole, reg, frame, share)
        x = jnp.concatenate([x_hole, bmask, x_share, uv_small], axis=3)
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
