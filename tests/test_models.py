"""Model zoo: shape contracts and semantic invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindshadowremoval_tpu.models.blocks import (
    ConvBlock,
    ConvTBlock,
    NonLocalBlock,
    ResBottleneck,
)
from blindshadowremoval_tpu.models.discriminator import (
    Discriminator,
    MultiScaleDiscriminators,
)
from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator
from blindshadowremoval_tpu.models.generator_tsm import ShareLayer, TSMGenerator

pytestmark = pytest.mark.slow   # full generator/discriminator compiles at 256^2

S = 64  # tiny spatial size for fast tests (must be divisible by 8)


def _gen_inputs(rng, b=2, s=S):
    img = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(b, s, s, 6)).astype(np.float32))
    return img, uv, reg


# ---------------------------------------------------------------- blocks


def test_conv_block_shapes(rng):
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 4)).astype(np.float32))
    m = ConvBlock(8, stride=2)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 8, 8, 8)
    assert "batch_stats" in vars_


def test_convt_block_upsamples(rng):
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 4)).astype(np.float32))
    m = ConvTBlock(8)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vars_, x).shape == (1, 16, 16, 8)


def test_nonlocal_block_residual(rng):
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 16)).astype(np.float32))
    m = NonLocalBlock(16)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == x.shape


def test_res_bottleneck_channel_pad(rng):
    # 99-ch input into a 257-ch block pads the residual (model.py:105-108)
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 99)).astype(np.float32))
    m = ResBottleneck(257)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vars_, x).shape == (1, 8, 8, 257)
    # wider input than block: output keeps input width (261-ch RGB branch)
    x2 = jnp.asarray(rng.uniform(size=(1, 8, 8, 261)).astype(np.float32))
    vars2 = m.init(jax.random.PRNGKey(0), x2)
    assert m.apply(vars2, x2).shape == (1, 8, 8, 261)


# ---------------------------------------------------------------- generators


def test_gsc_generator_contract(rng):
    img, uv, reg = _gen_inputs(rng)
    m = GSCGenerator()
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg)
    gs, rgb, mask22, dif = m.apply(vars_, img, uv, reg)
    assert gs.shape == (2, S, S, 1)
    assert rgb.shape == (2, S, S, 3)
    assert mask22.shape == (2, S, S, 3)
    assert dif.shape == (2, S, S, 1)
    # mask22 decomposition: nonnegative, middle channel zero
    assert float(jnp.min(mask22)) >= 0.0
    np.testing.assert_allclose(np.asarray(mask22[..., 1]), 0.0)


def test_gsc_train_mode_updates_batch_stats(rng):
    img, uv, reg = _gen_inputs(rng, b=2)
    m = GSCGenerator()
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg)
    out, mutated = m.apply(vars_, img, uv, reg, train=True,
                           mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_rgb_generator_contract(rng):
    img, uv, reg = _gen_inputs(rng)
    m = RGBGenerator()
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg)
    out = m.apply(vars_, img, uv, reg)
    assert out.shape == (2, S, S, 3)


def test_tsm_generator_contract(rng):
    img, uv, reg = _gen_inputs(rng, b=4)
    m = TSMGenerator()
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg, frame=2)
    gs, rgb, mask22, dif = m.apply(vars_, img, uv, reg, frame=2)
    assert rgb.shape == (4, S, S, 3)


def test_tsm_bf16_traced_share_gate(rng):
    """bf16 TSM with a TRACED share gate (the trainer's per-step random
    gate): both lax.cond branches must produce the same dtype — regression
    for the shared branch's f32-promoted warp output."""
    img, uv, reg = _gen_inputs(rng, b=2)
    m = TSMGenerator(dtype=jnp.bfloat16)
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg, frame=2)
    gs, rgb, _, _ = m.apply(vars_, img, uv, reg, frame=1,
                            share=jnp.asarray(True))
    assert rgb.shape == (2, S, S, 3)
    assert np.isfinite(np.asarray(rgb, np.float32)).all()


def test_tsm_share_false_matches_channel_contract(rng):
    img, uv, reg = _gen_inputs(rng, b=2)
    m = TSMGenerator()
    vars_ = m.init(jax.random.PRNGKey(0), img, uv, reg, frame=2, share=False)
    gs, rgb, _, _ = m.apply(vars_, img, uv, reg, frame=2, share=False)
    assert rgb.shape == (2, S, S, 3)


# ---------------------------------------------------------------- share layer


def test_share_layer_invariance_across_frames(rng):
    """Pooled statistics must be identical for every frame in a group."""
    x = jnp.asarray(rng.uniform(size=(4, 16, 16, 8)).astype(np.float32))
    reg = jnp.zeros((4, 16, 16, 6), np.float32)   # identity warp
    m = ShareLayer()
    out = m.apply({}, x, reg, 4, True)
    assert out.shape == (4, 16, 16, 16)
    for f in range(1, 4):
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[f]),
                                   atol=1e-5)
    # with identity warp the max/mean halves are exact
    np.testing.assert_allclose(np.asarray(out[0, ..., :8]),
                               np.asarray(jnp.max(x, axis=0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, ..., 8:]),
                               np.asarray(jnp.mean(x, axis=0)), atol=1e-5)


def test_share_layer_groups(rng):
    """Two groups of two frames pool independently."""
    x = jnp.asarray(rng.uniform(size=(4, 8, 8, 4)).astype(np.float32))
    reg = jnp.zeros((4, 8, 8, 6), np.float32)
    out = ShareLayer().apply({}, x, reg, 2, True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(out[3]), atol=1e-6)
    assert np.abs(np.asarray(out[0]) - np.asarray(out[2])).max() > 1e-3


def test_share_layer_passthrough(rng):
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 4)).astype(np.float32))
    reg = jnp.zeros((2, 8, 8, 6), np.float32)
    out = ShareLayer().apply({}, x, reg, 2, False)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.concatenate([x, x], axis=3)))


# ---------------------------------------------------------------- discriminator


def test_discriminator_splits_real_fake(rng):
    x = jnp.asarray(rng.uniform(size=(4, S, S, 6)).astype(np.float32))
    m = Discriminator(downsize=1, num_layers=4)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    real, fake = m.apply(vars_, x)
    assert real.shape == fake.shape == (2, S // 16, S // 16, 1)


def test_multiscale_discriminators(rng):
    x = jnp.asarray(rng.uniform(size=(4, S, S, 6)).astype(np.float32))
    m = MultiScaleDiscriminators()
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 3
    # scales shrink by the downsize factor
    assert outs[0][0].shape[1] == 2 * outs[1][0].shape[1]
    assert outs[1][0].shape[1] == 2 * outs[2][0].shape[1]


# ---------------------------------------------------------------- vgg


def test_vgg_feature_taps(rng):
    from blindshadowremoval_tpu.models.vgg import VGG19Features, preprocess

    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    m = VGG19Features()
    vars_ = m.init(jax.random.PRNGKey(0), preprocess(img))
    feats = m.apply(vars_, preprocess(img))
    assert len(feats) == 5
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[4].shape == (1, 4, 4, 512)


def test_space_to_depth_conv_exact():
    """space_to_depth_conv must equal the direct stride-1 SAME conv."""
    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.blocks import space_to_depth_conv

    rng = np.random.default_rng(0)
    for k, cin, cout, s in ((7, 3, 32, 32), (7, 64, 2, 64), (3, 3, 3, 16),
                            (5, 5, 7, 24)):
        x = jnp.asarray(rng.normal(size=(2, s, s, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = space_to_depth_conv(x, w, b, jnp.float32)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-4, (k, cin, cout, err)


def test_s2d_convblock_param_tree_compatible():
    """The s2d path keeps nn.Conv's Conv_0/{kernel,bias} tree, and its
    output matches the plain ConvBlock with shared params."""
    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.blocks import ConvBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    plain = ConvBlock(8, ksize=7, norm=None, act=False)
    fast = ConvBlock(8, ksize=7, norm=None, act=False, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]["Conv_0"]) == {"kernel", "bias"}
    a = plain.apply(v, x)
    b = fast.apply(v, x)           # same tree consumed by the s2d path
    assert float(jnp.abs(a - b).max()) < 1e-4
