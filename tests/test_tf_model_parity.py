"""MODEL-LEVEL forward parity against the actual TF reference.

The fixtures in goldens/tf_ref/ were produced by tools/make_tf_ref_goldens.py:
the reference generator (/root/reference/model.py:198-290) built in TF on
CPU, loaded with `synthetic_tf_weights` (a pure function of the TF variable
name + seed), forwarded on seeded inputs.  Here the SAME weights go through
the tf_checkpoint bridge into the Flax model and the forwards must agree —
this covers, end-to-end, the two fidelity risks SURVEY.md names as hard
part 1: Keras BatchNorm semantics composed through 40+ layers (both
moving-stat inference and batch-stat training mode) and the Conv2DTranspose
kernel transform.
"""

import os

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.tf_checkpoint import (
    generator_mapping, load_weights_dict, synthetic_tf_weights)

pytestmark = pytest.mark.slow   # imports TensorFlow and runs the TF model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "tf_ref")
SIZE = 128          # must match tools/make_tf_ref_goldens.py
INPUT_SEED = 123
OUT_NAMES = ("gs", "con_rgb", "mask22", "dif")


def seeded_inputs(size: int, n_reg: int = 6):
    rng = np.random.default_rng(INPUT_SEED)
    img = rng.uniform(0.0, 1.0, (1, size, size, 3)).astype(np.float32)
    uv = rng.uniform(0.0, 1.0, (1, size, size, 3)).astype(np.float32)
    reg = rng.uniform(-0.02, 0.02, (1, size, size, n_reg)).astype(np.float32)
    return img, uv, reg


@pytest.fixture(scope="module")
def gsc_setup():
    golden = np.load(os.path.join(GOLDEN_DIR, "gsc_forward.npz"))
    gen = GSCGenerator()
    img, uv, reg = seeded_inputs(SIZE)
    variables = gen.init(jax.random.PRNGKey(0), img[:, :64, :64],
                         uv[:, :64, :64], reg[:, :64, :64])
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=0)
    variables = load_weights_dict(weights, variables, generator_mapping())
    return gen, variables, (img, uv, reg), golden


def _tolerance(golden, mode: str, name: str) -> float:
    """1e-4 floor, widened by the measured TF self-noise.

    The goldens record each output's eager-vs-tf.function discrepancy
    (`*_selfnoise`): the reference's OWN forward moves by ~1e-3..4e-3 in
    train mode under a different float execution order, so cross-framework
    agreement can only be asserted up to a multiple of that floor.
    """
    self_noise = float(golden[f"{mode}_{name}_selfnoise"])
    return max(1e-4, 20.0 * self_noise)


def test_gsc_forward_parity_eval(gsc_setup):
    gen, variables, (img, uv, reg), golden = gsc_setup
    outs = jax.jit(lambda v, i, u, r: gen.apply(v, i, u, r, train=False))(
        variables, img, uv, reg)
    for name, out in zip(OUT_NAMES, outs):
        ref = golden[f"eval_{name}"]
        err = np.abs(np.asarray(out) - ref).max()
        tol = _tolerance(golden, "eval", name)
        assert err < tol, f"{name}: max abs err {err} (tol {tol})"


def test_gsc_forward_parity_train_mode(gsc_setup):
    """training=True exercises batch-stat BN through every layer."""
    gen, variables, (img, uv, reg), golden = gsc_setup
    outs, _ = jax.jit(
        lambda v, i, u, r: gen.apply(v, i, u, r, train=True,
                                     mutable=["batch_stats"]))(
        variables, img, uv, reg)
    for name, out in zip(OUT_NAMES, outs):
        ref = golden[f"train_{name}"]
        err = np.abs(np.asarray(out) - ref).max()
        tol = _tolerance(golden, "train", name)
        assert err < tol, f"{name}: max abs err {err} (tol {tol})"


@pytest.fixture(scope="module")
def tsm_setup():
    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator

    golden = np.load(os.path.join(GOLDEN_DIR, "tsm_forward.npz"))
    gen = TSMGenerator()
    img, uv, reg = seeded_inputs(SIZE)
    rng = np.random.default_rng(INPUT_SEED + 1)
    img = np.concatenate([img, rng.uniform(0, 1, img.shape)], 0).astype(
        np.float32)
    uv = np.concatenate([uv, rng.uniform(0, 1, uv.shape)], 0).astype(
        np.float32)
    reg = np.concatenate(
        [reg, rng.uniform(-0.02, 0.02, reg.shape)], 0).astype(np.float32)
    variables = gen.init(jax.random.PRNGKey(0), img[:, :64, :64],
                         uv[:, :64, :64], reg[:, :64, :64], frame=2)
    weights = synthetic_tf_weights(variables, generator_mapping("tsm"),
                                   seed=0)
    variables = load_weights_dict(weights, variables,
                                  generator_mapping("tsm"))
    return gen, variables, (img, uv, reg), golden


def test_tsm_forward_parity_eval(tsm_setup):
    """Covers the ShareLayer (warp -> cross-frame max/mean -> unwarp)
    composed with the widened res/up stacks against the TF reference."""
    gen, variables, (img, uv, reg), golden = tsm_setup
    outs = jax.jit(lambda v, i, u, r: gen.apply(
        v, i, u, r, frame=2, share=True, train=False))(
        variables, img, uv, reg)
    for name, out in zip(OUT_NAMES, outs):
        ref = golden[f"eval_{name}"]
        err = np.abs(np.asarray(out) - ref).max()
        tol = _tolerance(golden, "eval", name)
        assert err < tol, f"{name}: max abs err {err} (tol {tol})"


def test_tsm_forward_parity_train_mode(tsm_setup):
    gen, variables, (img, uv, reg), golden = tsm_setup
    outs, _ = jax.jit(lambda v, i, u, r: gen.apply(
        v, i, u, r, frame=2, share=True, train=True,
        mutable=["batch_stats"]))(variables, img, uv, reg)
    for name, out in zip(OUT_NAMES, outs):
        ref = golden[f"train_{name}"]
        err = np.abs(np.asarray(out) - ref).max()
        tol = _tolerance(golden, "train", name)
        assert err < tol, f"{name}: max abs err {err} (tol {tol})"


@pytest.fixture(scope="module")
def rgb_setup():
    from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator

    golden = np.load(os.path.join(GOLDEN_DIR, "rgb_forward.npz"))
    gen = RGBGenerator()
    img, uv, reg = seeded_inputs(SIZE)
    variables = gen.init(jax.random.PRNGKey(0), img[:, :64, :64],
                         uv[:, :64, :64], reg[:, :64, :64])
    weights = synthetic_tf_weights(variables, generator_mapping("rgb"),
                                   seed=0)
    variables = load_weights_dict(weights, variables,
                                  generator_mapping("rgb"))
    return gen, variables, (img, uv, reg), golden


def test_rgb_forward_parity_eval(rgb_setup):
    gen, variables, (img, uv, reg), golden = rgb_setup
    con = jax.jit(lambda v, i, u, r: gen.apply(v, i, u, r, train=False))(
        variables, img, uv, reg)
    err = np.abs(np.asarray(con) - golden["eval_con"]).max()
    tol = _tolerance(golden, "eval", "con")
    assert err < tol, f"con: max abs err {err} (tol {tol})"


def test_rgb_forward_parity_train_mode(rgb_setup):
    gen, variables, (img, uv, reg), golden = rgb_setup
    con, _ = jax.jit(
        lambda v, i, u, r: gen.apply(v, i, u, r, train=True,
                                     mutable=["batch_stats"]))(
        variables, img, uv, reg)
    err = np.abs(np.asarray(con) - golden["train_con"]).max()
    tol = _tolerance(golden, "train", "con")
    assert err < tol, f"con: max abs err {err} (tol {tol})"
