"""Multi-scale PatchGAN-style discriminators.

Re-design of `Discriminator` (model.py:292-312) and the three-scale trio the
trainer instantiates at input scales 1x/2x/4x (train_test_GSC.py:121-123).
Each discriminator is a stack of stride-2 4x4 conv+BN+LeakyReLU layers
followed by a 4x4 conv to a 1-channel logit map.  The caller stacks real and
fake images on the batch axis and the output is split back into
(real_logits, fake_logits) — preserving the reference's shared-BN-statistics
behavior across real/fake, which matters for training dynamics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from blindshadowremoval_tpu.geometry.warp import resize_bilinear
from blindshadowremoval_tpu.models.blocks import ConvBlock

_D_CH = (32, 32, 64, 64, 128, 256)   # model.py:295


class Discriminator(nn.Module):
    """Single-scale discriminator over a real-and-fake stacked batch."""

    downsize: int = 1
    num_layers: int = 4    # n_layer_D (train_test_GSC.py:53)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        if self.downsize > 1:
            _, h, w, _ = x.shape
            x = resize_bilinear(x, (h // self.downsize, w // self.downsize))
        for i in range(self.num_layers):
            x = ConvBlock(_D_CH[i], ksize=4, stride=2, norm="batch",
                          dtype=self.dtype, name=f"conv{i}")(x, train)
        x = ConvBlock(1, ksize=4, norm=None, act=False,
                      dtype=self.dtype, name="head")(x, train)
        real, fake = jnp.split(x.astype(jnp.float32), 2, axis=0)
        return real, fake


class MultiScaleDiscriminators(nn.Module):
    """The 1x/2x/4x discriminator trio (train_test_GSC.py:121-123).

    Returns a list of (real_logits, fake_logits) pairs, one per scale.
    """

    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        outs = []
        for k, ds in enumerate((1, 2, 4)):
            outs.append(Discriminator(downsize=ds, num_layers=self.num_layers,
                                      dtype=self.dtype, name=f"disc{k + 1}")(
                x, train))
        return outs
