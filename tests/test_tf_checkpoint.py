"""Checkpoint bridge: the name/shape contract vs the shipped TF index.

This is the machine check for SURVEY.md hard part 1 — every variable in the
reference's trained GSC checkpoint (ckpt-94 index; data blobs stripped) must
map onto exactly one leaf of our Flax tree with a consistent shape.
"""

import os

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.models.tf_checkpoint import (
    _convt_transform,
    discriminator_mapping,
    generator_mapping,
    _tree_get,
)

pytestmark = pytest.mark.slow   # imports TensorFlow to read ckpt indexes

_LOG = ("/root/reference/log/FSR-OG-perlin-mask-OG-loss-weights-l1-recon-"
        "fix-BGR-to-RGB-fix-VGG-greater-augmentation-reweight-gradients")
CKPT = _LOG + "/ckpt-94"
CKPT_TSM = _LOG + "-with-TSM/ckpt-110"
CKPT_RGB = _LOG + "-RGB-model/ckpt-130"

needs_ckpt = pytest.mark.skipif(
    not os.path.isfile(CKPT + ".index"), reason="reference ckpt index absent")


def _gen_variables():
    from blindshadowremoval_tpu.models.generator import GSCGenerator

    gen = GSCGenerator()
    img = np.zeros((1, 256, 256, 3), np.float32)
    reg = np.zeros((1, 256, 256, 6), np.float32)
    return gen.init(jax.random.PRNGKey(0), img, img, reg)


def _tsm_variables():
    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator

    gen = TSMGenerator()
    img = np.zeros((2, 64, 64, 3), np.float32)
    reg = np.zeros((2, 64, 64, 6), np.float32)
    return gen.init(jax.random.PRNGKey(0), img, img, reg, frame=2)


def _rgb_variables():
    from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator

    gen = RGBGenerator()
    img = np.zeros((1, 64, 64, 3), np.float32)
    reg = np.zeros((1, 64, 64, 6), np.float32)
    return gen.init(jax.random.PRNGKey(0), img, img, reg)


def _disc_variables():
    from blindshadowremoval_tpu.models.discriminator import (
        MultiScaleDiscriminators,
    )

    disc = MultiScaleDiscriminators()
    return disc.init(jax.random.PRNGKey(0),
                     np.zeros((2, 256, 256, 6), np.float32))


def test_mapping_paths_exist_in_flax_tree():
    variables = _gen_variables()
    for path, tf_name, _, *rest in generator_mapping():
        leaf = _tree_get(variables, path)
        assert leaf is not None, (path, tf_name)
        if rest:  # sliced destination must fit inside the leaf
            start, stop = rest[0]
            assert 0 <= start < stop <= np.asarray(leaf).shape[-1]


def test_convt_transform_shape_and_flip():
    k = np.arange(3 * 3 * 4 * 5, dtype=np.float32).reshape(3, 3, 4, 5)
    out = _convt_transform(k)
    assert out.shape == (3, 3, 5, 4)
    np.testing.assert_allclose(out[0, 0, :, :], k[2, 2, :, :].T)


@needs_ckpt
def test_generator_bridge_complete():
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import verify_against_index

    variables = _gen_variables()
    report = verify_against_index(CKPT, variables, generator_mapping())
    gen_unmapped = [n for n in report["unmapped_tf"]
                    if n.startswith("generator/")]
    assert report["missing_in_tf"] == []
    assert report["shape_mismatch"] == []
    assert gen_unmapped == []
    assert report["matched"] == 258   # observed generator variable count


@needs_ckpt
def test_generator_bridge_complete_tsm():
    """ckpt-110: same variable names as gsc; the ShareLayer concat widens
    res0/res3/up1/clr_up1 inputs — shapes come from the TSM Flax tree."""
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import verify_against_index

    variables = _tsm_variables()
    report = verify_against_index(CKPT_TSM, variables,
                                  generator_mapping("tsm"))
    gen_unmapped = [n for n in report["unmapped_tf"]
                    if n.startswith("generator/")]
    assert report["missing_in_tf"] == []
    assert report["shape_mismatch"] == []
    assert gen_unmapped == []
    assert report["matched"] == 258


@needs_ckpt
def test_generator_bridge_complete_rgb():
    """ckpt-130: no clr_* branch (never built by TF), sequential 3-channel
    conv2/conv3 (no head fusion), doubled up-conv widths."""
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import verify_against_index

    variables = _rgb_variables()
    report = verify_against_index(CKPT_RGB, variables,
                                  generator_mapping("rgb"))
    gen_unmapped = [n for n in report["unmapped_tf"]
                    if n.startswith("generator/")]
    assert report["missing_in_tf"] == []
    assert report["shape_mismatch"] == []
    assert gen_unmapped == []
    assert report["matched"] == 136   # observed ckpt-130 generator count


@needs_ckpt
def test_discriminator_bridge_complete_tsm_rgb_checkpoints():
    """The discriminator trio contract holds across all three shipped
    checkpoints (the variants share the discriminator architecture)."""
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import verify_against_index

    variables = _disc_variables()
    for ckpt in (CKPT_TSM, CKPT_RGB):
        report = verify_against_index(ckpt, variables,
                                      discriminator_mapping())
        assert report["missing_in_tf"] == [], ckpt
        assert report["shape_mismatch"] == [], ckpt


@needs_ckpt
def test_discriminator_bridge_complete():
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import verify_against_index

    variables = _disc_variables()
    report = verify_against_index(CKPT, variables, discriminator_mapping())
    # exclude the optimizer hyperparameter scalars (beta_1, iter, ...)
    disc_unmapped = [n for n in report["unmapped_tf"]
                     if n.startswith(("discriminator_1/", "discriminator_2/",
                                      "discriminator_3/"))]
    assert report["missing_in_tf"] == []
    assert report["shape_mismatch"] == []
    assert disc_unmapped == []


@needs_ckpt
def test_load_raises_on_stripped_blobs():
    pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import load_tf_checkpoint

    variables = _gen_variables()
    with pytest.raises((RuntimeError, Exception)):
        load_tf_checkpoint(CKPT, variables, generator_mapping())


def test_sliced_load_writes_both_head_channels(tmp_path):
    """Regression: loading the fused head accumulates two TF tensors into
    channel slices of one flax leaf — the second write must not hit a
    read-only buffer view."""
    tf = pytest.importorskip("tensorflow")
    from blindshadowremoval_tpu.models.tf_checkpoint import (
        _identity,
        load_tf_checkpoint,
    )

    root = tf.Module()
    root.generator = tf.Module()
    for name, fill in (("conv2", 2.0), ("conv3", 3.0)):
        layer = tf.Module()
        layer.conv = tf.Module()
        layer.conv.kernel = tf.Variable(
            np.full((7, 7, 4, 1), fill, np.float32))
        layer.conv.bias = tf.Variable(np.full((1,), fill, np.float32))
        setattr(root.generator, name, layer)
    ckpt = tf.train.Checkpoint(root=root)
    prefix = ckpt.save(str(tmp_path / "ckpt"))

    mapping = []
    for i, tf_layer in enumerate(("conv2", "conv3")):
        for leaf in ("kernel", "bias"):
            mapping.append(
                (("params", "head", "Conv_0", leaf),
                 f"generator/{tf_layer}/conv/{leaf}",
                 _identity, (i, i + 1)))

    variables = {"params": {"head": {"Conv_0": {
        "kernel": jax.numpy.zeros((7, 7, 4, 2)),
        "bias": jax.numpy.zeros((2,))}}}}
    out = load_tf_checkpoint(prefix, variables, mapping)
    k = np.asarray(out["params"]["head"]["Conv_0"]["kernel"])
    b = np.asarray(out["params"]["head"]["Conv_0"]["bias"])
    assert (k[..., 0] == 2.0).all() and (k[..., 1] == 3.0).all()
    assert b[0] == 2.0 and b[1] == 3.0
