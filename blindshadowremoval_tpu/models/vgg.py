"""Frozen VGG-19 feature extractor for the perceptual loss.

Re-design of the reference's Keras VGG19 tap (train_test_GSC.py:128-160):
features from block{1..5}_conv1, fed caffe-preprocessed input
(`vgg19.preprocess_input(img*255)`: RGB -> BGR, minus ImageNet channel
means — utils.py:105).

ImageNet weights are not bundled (this image has no network egress and no
cached Keras weights); `load_weights_npz` accepts a converted `.npz` of the
Keras h5 (keys like `block1_conv1/kernel`).  Without weights the extractor is
He-initialized — the perceptual term then acts as a random-projection feature
loss (still a valid training signal, cf. random-VGG literature), and the
loss-parity contract is documented as requiring real weights.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (layer-name, features, conv count) per VGG19 block
_CFG = (("block1", 64, 2), ("block2", 128, 2), ("block3", 256, 4),
        ("block4", 512, 4), ("block5", 512, 4))

# ImageNet BGR channel means used by keras.applications preprocess (caffe mode)
_BGR_MEAN = (103.939, 116.779, 123.68)


def preprocess(img01: jax.Array) -> jax.Array:
    """[B,H,W,3] RGB in [0,1] -> caffe-style BGR-mean-subtracted input."""
    x = img01[..., ::-1] * 255.0
    return x - jnp.asarray(_BGR_MEAN, x.dtype)


class VGG19Features(nn.Module):
    """Returns features at block{1..5}_conv1 (the reference's style taps)."""

    taps: Sequence[str] = ("block1_conv1", "block2_conv1", "block3_conv1",
                           "block4_conv1", "block5_conv1")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        x = x.astype(self.dtype)
        for block, width, n_conv in _CFG:
            for i in range(1, n_conv + 1):
                name = f"{block}_conv{i}"
                x = nn.Conv(width, (3, 3), padding="SAME", name=name,
                            dtype=self.dtype)(x)
                x = nn.relu(x)
                if name in self.taps:
                    feats.append(x.astype(jnp.float32))
            if len(feats) == len(self.taps):
                break
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def load_weights_npz(path: str):
    """Build a frozen param pytree from an npz of Keras-style VGG19 weights.

    Expected keys: `<block>_conv<i>/kernel` [3,3,in,out] and
    `<block>_conv<i>/bias` [out] (already HWIO, as Keras stores them).
    """
    raw = np.load(path)
    params = {}
    for block, _, n_conv in _CFG:
        for i in range(1, n_conv + 1):
            name = f"{block}_conv{i}"
            if f"{name}/kernel" not in raw:
                continue
            params[name] = {
                "kernel": jnp.asarray(raw[f"{name}/kernel"]),
                "bias": jnp.asarray(raw[f"{name}/bias"]),
            }
    return {"params": params}
