"""Int8 serving path: numerics, checkpoint interchange, and parity bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.ops.quant import int8_conv, quantize_weight


import pytest

pytestmark = pytest.mark.slow   # int8 head variants compile the full forward

def test_quantize_weight_roundtrip(rng):
    w = rng.normal(size=(3, 3, 8, 4)).astype(np.float32)
    wq, scale = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8
    deq = np.asarray(wq, np.float32) * np.asarray(scale)
    assert np.abs(deq - w).max() <= np.abs(w).max() / 127.0 + 1e-6


def test_int8_conv_close_to_float(rng):
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 8, 4)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=dn) + b
    got = int8_conv(x, w, b)
    # symmetric int8 with per-channel weight scales: ~1% relative error
    rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-6))
    assert rel < 0.02, rel


def test_int8_head_checkpoint_interchange(rng):
    """int8_head=True has the identical parameter tree and near-identical
    outputs for the same checkpoint (head parity 38-40 dB vs f32 on TPU;
    docs/perf.md)."""
    from blindshadowremoval_tpu.models.generator import GSCGenerator

    s = 32
    img = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(1, s, s, 6)).astype(np.float32))

    g0 = GSCGenerator()
    g8 = GSCGenerator(int8_head=True)
    v = g0.init(jax.random.PRNGKey(0), img, uv, reg)
    tree0 = jax.tree.structure(v)
    tree8 = jax.tree.structure(
        jax.eval_shape(lambda k: g8.init(k, img, uv, reg),
                       jax.random.PRNGKey(0)))
    assert tree0 == tree8

    gs0, rgb0, _, dif0 = g0.apply(v, img, uv, reg)
    gs8, rgb8, _, dif8 = g8.apply(v, img, uv, reg)
    mse = float(jnp.mean((rgb0 - rgb8) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr
    assert np.isfinite(np.asarray(gs8)).all()
    assert np.isfinite(np.asarray(dif8)).all()


def test_int8_head_split_semantics(rng):
    """int8_head_split: identical parameter tree; the tanh-gain channel
    (head ch 0) is EXACT vs the float path while only `con` (ch 1) carries
    int8 noise — so `gs - gray` holes can only move through con."""
    from blindshadowremoval_tpu.models.blocks import _Int8Conv
    from blindshadowremoval_tpu.models.generator import GSCGenerator
    from blindshadowremoval_tpu.ops.quant import int8_conv

    # module level: split conv == exact conv on the excluded channel,
    # == int8_conv on the quantized one
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 8)).astype(np.float32))
    m = _Int8Conv(2, 7, int8_channels=(1,))
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    w, b = v["params"]["kernel"], v["params"]["bias"]
    exact = jax.lax.conv_general_dilated(
        x, w[..., 0:1], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b[0]
    q = int8_conv(x, w[..., 1:2], b[1:2])
    np.testing.assert_allclose(np.asarray(y[..., 0:1]), np.asarray(exact),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[..., 1:2]), np.asarray(q),
                               atol=1e-6)

    # model level: same tree, outputs finite and close to float
    s = 32
    img = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(1, s, s, 6)).astype(np.float32))
    g0 = GSCGenerator()
    gsplit = GSCGenerator(int8_head_split=True)
    vg = g0.init(jax.random.PRNGKey(0), img, uv, reg)
    assert jax.tree.structure(vg) == jax.tree.structure(
        jax.eval_shape(lambda k: gsplit.init(k, img, uv, reg),
                       jax.random.PRNGKey(0)))
    gs0, rgb0, m220, dif0 = g0.apply(vg, img, uv, reg)
    gs1, rgb1, m221, dif1 = gsplit.apply(vg, img, uv, reg)
    # mask22 is a pure function of the tanh-gain channel => exact
    np.testing.assert_allclose(np.asarray(m221), np.asarray(m220),
                               atol=1e-6)
    mse = float(jnp.mean((rgb0 - rgb1) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_int8_conv_straight_through_gradients(rng):
    """The STE backward must match the float-conv gradient (round/clip/int
    cast would otherwise zero it almost everywhere, silently breaking any
    training run with int8_head on)."""
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 4, 2)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))

    def loss_q(x, w, b):
        return jnp.sum(int8_conv(x, w, b) ** 2) * 0.5

    def loss_f(x, w, b):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                           dimension_numbers=dn) + b
        return jnp.sum(out ** 2) * 0.5

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)
    for q, f in zip(gq, gf):
        # cotangent feeding the STE is the quantized output (~1% off), and
        # the backward conv itself is exact — so gradients agree to ~2%
        rel = float(jnp.abs(q - f).max() / (jnp.abs(f).max() + 1e-6))
        assert rel < 0.05, rel
        # and critically: dense, not argmax-sparse
        assert float((jnp.abs(q) > 0).mean()) > 0.9


def test_int8_conv_static_scale():
    """A calibrated static scale matches the dynamic path when the bound
    covers the activations, and saturates (not wraps) beyond it."""
    import jax.numpy as jnp

    from blindshadowremoval_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    import jax

    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    tol = float(np.abs(ref).max()) * 0.05
    # dynamic (per-sample max) and static (one calibrated bound) both track
    # the float conv within their quantization grids
    dyn = np.asarray(int8_conv(x, w, b))
    assert np.abs(dyn - ref).max() < tol
    stat = np.asarray(int8_conv(x, w, b, static_scale=float(jnp.abs(x).max())))
    assert np.abs(stat - ref).max() < tol
    # a looser bound coarsens the grid but stays close
    loose = np.asarray(int8_conv(x, w, b, static_scale=12.0))
    assert np.abs(loose - ref).max() < 4 * tol

    # values beyond the bound saturate instead of wrapping
    spike = x.at[0, 0, 0, 0].set(100.0)
    sat = np.asarray(int8_conv(spike, w, b, static_scale=4.0))
    assert np.isfinite(sat).all()


def test_int8_conv_per_channel_scale(rng):
    """Per-input-channel bounds: exactness contract and the measured
    coupling that bounds their benefit.

    Folding per-channel activation scales into the kernel makes EVERY
    channel's xq full-scale, so the per-output-channel weight grid (set by
    the largest folded tap) multiplies large codes for all taps: the
    activation-side win is partly traded for weight-side error.  With
    channel-independent weights and 100x activation ranges the two nearly
    cancel (first measured here — this is why the scheme is an option, not
    the default; the scalar bound remains the production head config,
    docs/perf.md)."""
    import pytest

    cin, cout = 8, 4
    ranges = np.geomspace(0.1, 10.0, cin).astype(np.float32)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, cin)).astype(
        np.float32) * ranges)
    w = jnp.asarray(rng.normal(0, 0.2, size=(3, 3, cin, cout)).astype(
        np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)

    scalar = np.asarray(int8_conv(x, w, b,
                                  static_scale=float(ranges.max())))
    per_ch = np.asarray(int8_conv(x, w, b,
                                  static_scale=tuple(float(r)
                                                     for r in ranges)))
    scale = np.abs(ref).max() + 1e-6
    # both paths are correct int8 approximations of the float conv
    assert np.abs(scalar - ref).max() / scale < 0.05
    assert np.abs(per_ch - ref).max() / scale < 0.05
    # and comparable: per-channel does NOT blow up despite 100x folded
    # weight ranges (nor does it dominate — the weight-grid coupling)
    assert np.abs(per_ch - ref).max() < 2.0 * np.abs(scalar - ref).max()

    with pytest.raises(ValueError, match="per-channel"):
        int8_conv(x, w, b, static_scale=(1.0, 2.0))


def test_head_input_bounds_cover_activations(rng):
    """The checkpoint-derived K-sigma bounds (ops/calibration.py) cover the
    eval-mode BN+LeakyReLU output distribution they model."""
    from blindshadowremoval_tpu.ops.calibration import head_input_bounds

    ch = 16
    gamma = rng.uniform(0.05, 3.0, ch).astype(np.float32)
    beta = rng.normal(0, 2.0, ch).astype(np.float32)
    variables = {"params": {"up3": {"BatchNorm_0": {
        "scale": gamma, "bias": beta}}}}
    bounds = np.asarray(head_input_bounds(variables))
    assert bounds.shape == (ch,) and (bounds > 0).all()

    # activations whose stats match the running stats come out of eval BN
    # as N(beta, gamma^2); through LeakyReLU the 8-sigma envelope covers the
    # max of 100k draws (~4.5 sigma) with margin
    z = rng.normal(0, 1, size=(100_000, ch)).astype(np.float32)
    y = gamma * z + beta
    y = np.where(y > 0, y, 0.3 * y)
    assert (np.abs(y).max(axis=0) <= bounds).all()


def test_calibrate_config_auto(rng):
    """calibrate_config replaces the 0.0 AUTO default with per-channel
    bounds from the checkpoint, and leaves explicit settings alone."""
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.models.generator import GSCGenerator
    from blindshadowremoval_tpu.ops.calibration import calibrate_config

    s = 32
    img = jnp.asarray(rng.uniform(size=(1, s, s, 3)).astype(np.float32))
    v = GSCGenerator().init(jax.random.PRNGKey(0), img, img,
                            jnp.zeros((1, s, s, 6), jnp.float32))

    cfg = calibrate_config(
        get_config("in_the_wild", int8_head=True), v)
    assert isinstance(cfg.int8_head_scale, tuple)
    assert len(cfg.int8_head_scale) == 64   # up3 width (N_CH[1])

    # the calibrated config builds and runs a generator
    from blindshadowremoval_tpu.train.trainer import build_generator

    gen = build_generator(cfg)
    out = gen.apply(v, img, img, jnp.zeros((1, s, s, 6), jnp.float32))
    assert np.isfinite(np.asarray(out[1])).all()

    # explicit scalar / dynamic / int8-off / rgb are untouched
    for kw in (dict(int8_head=True, int8_head_scale=18.29),
               dict(int8_head=True, int8_head_scale=-1.0),
               dict(int8_head=False),
               dict(int8_head=True, variant="rgb")):
        c = get_config("in_the_wild", **kw)
        assert calibrate_config(c, v) is c
