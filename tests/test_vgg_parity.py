"""Keras->Flax VGG-19 chain parity.

The reference's perceptual loss taps block{1..5}_conv1 of
`tf.keras.applications.VGG19` fed `vgg19.preprocess_input(img*255)`
(train_test_GSC.py:128-160, utils.py:104-114).  This image has no network
egress, so the ImageNet h5 cannot be fetched — but the CHAIN can still be
machine-verified with synthetic weights: build the Keras model uninitialized,
export its weights through the same h5 layout the released
`vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5` uses, convert with
tools/convert_vgg_weights.py, and assert `VGG19Features` (+ its caffe
preprocess) reproduces TF's tap activations.  A user who supplies the real
h5 then gets the reference's exact perceptual loss.
"""

import os
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # imports TensorFlow (~40 s on 1 core)

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


def test_vgg19_chain_parity(tmp_path, rng):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    vgg = tf.keras.applications.VGG19(include_top=False, weights=None)

    # export in the released file's layout: <layer>/<layer>/{kernel:0,bias:0}
    import h5py

    h5_path = str(tmp_path / "vgg19_rand.h5")
    with h5py.File(h5_path, "w") as f:
        for layer in vgg.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            grp = f.create_group(layer.name).create_group(layer.name)
            grp.create_dataset("kernel:0", data=ws[0])
            grp.create_dataset("bias:0", data=ws[1])

    sys.path.insert(0, TOOLS)
    try:
        from convert_vgg_weights import main as convert
    finally:
        sys.path.remove(TOOLS)
    npz_path = str(tmp_path / "vgg19.npz")
    assert convert(h5_path, npz_path) == 0

    from blindshadowremoval_tpu.models.vgg import (
        VGG19Features, load_weights_npz, preprocess)

    variables = load_weights_npz(npz_path)
    # all 16 convs present (taps need conv1..4 of the deep blocks en route)
    assert len(variables["params"]) == 16

    img01 = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    # TF reference: exactly the reference's call chain (utils.py:105)
    x_tf = tf.keras.applications.vgg19.preprocess_input(
        tf.constant(img01) * 255.0)
    taps = ["block1_conv1", "block2_conv1", "block3_conv1", "block4_conv1",
            "block5_conv1"]
    extractor = tf.keras.Model(
        [vgg.input], [vgg.get_layer(n).output for n in taps])
    ref = [np.asarray(t) for t in extractor(x_tf)]

    ours = jax.jit(VGG19Features().apply)(variables, preprocess(img01))
    assert len(ours) == len(ref)
    for name, a, b in zip(taps, ours, ref):
        scale = np.abs(b).max() + 1e-6
        err = np.abs(np.asarray(a) - b).max() / scale
        assert err < 1e-4, (name, err)
