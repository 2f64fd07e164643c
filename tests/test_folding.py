"""Serving-time BatchNorm folding (models/folding.py): exact algebra.

Folding an eval-mode BatchNorm into its producing conv must compute the
identical function for ANY running statistics, so the tests randomize
batch_stats (post-init they are mean 0 / var 1, which would hide
mean/var-handling bugs) and compare the folded generator against the live-BN
one in f32 across all three variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindshadowremoval_tpu.models.folding import fold_batch_norm
from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator
from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator

S = 64


def _randomize_stats(variables, rng):
    """Give every BatchNorm non-trivial running statistics and affine."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k.startswith("BatchNorm_") and "mean" in v:
                out[k] = {
                    "mean": jnp.asarray(
                        rng.normal(0, 0.5, v["mean"].shape), jnp.float32),
                    "var": jnp.asarray(
                        rng.uniform(0.2, 3.0, v["var"].shape), jnp.float32),
                }
            elif k.startswith("BatchNorm_") and "scale" in v:
                out[k] = {
                    "scale": jnp.asarray(
                        rng.uniform(0.3, 2.0, v["scale"].shape), jnp.float32),
                    "bias": jnp.asarray(
                        rng.normal(0, 0.3, v["bias"].shape), jnp.float32),
                }
            else:
                out[k] = walk(v)
        return out

    return {"params": walk(variables["params"]),
            "batch_stats": walk(variables["batch_stats"])}


def _inputs(rng, extra_reg=False):
    img = jnp.asarray(rng.uniform(size=(1, S, S, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(1, S, S, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(1, S, S, 6)).astype(np.float32))
    return img, uv, reg


@pytest.mark.parametrize("variant", ["gsc", "tsm", "rgb"])
def test_fold_batch_norm_exact(rng, variant):
    cls = {"gsc": GSCGenerator, "tsm": TSMGenerator, "rgb": RGBGenerator}[
        variant]
    img, uv, reg = _inputs(rng)
    live = cls()
    variables = _randomize_stats(live.init(jax.random.PRNGKey(0), img, uv,
                                           reg), rng)
    ref = live.apply(variables, img, uv, reg)

    folded_vars = fold_batch_norm(variables)
    assert "batch_stats" not in folded_vars
    flat = jax.tree_util.tree_leaves_with_path(folded_vars)
    assert not any("BatchNorm" in jax.tree_util.keystr(p) for p, _ in flat)

    out = cls(fold_bn=True).apply(folded_vars, img, uv, reg)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_fold_requires_known_producer():
    with pytest.raises(ValueError, match="no paired conv"):
        fold_batch_norm({
            "params": {"blk": {"BatchNorm_0": {"scale": jnp.ones(4),
                                               "bias": jnp.zeros(4)},
                               "Dense_0": {"kernel": jnp.ones((4, 4))}}},
            "batch_stats": {"blk": {"BatchNorm_0": {"mean": jnp.zeros(4),
                                                    "var": jnp.ones(4)}}},
        })


def test_egress_dtype(rng):
    img, uv, reg = _inputs(rng)
    gen = GSCGenerator(egress_dtype=jnp.bfloat16)
    v = gen.init(jax.random.PRNGKey(0), img, uv, reg)
    outs = gen.apply(v, img, uv, reg)
    assert all(o.dtype == jnp.bfloat16 for o in outs)
    # bf16 egress matches the f32 egress within bf16 resolution
    ref = GSCGenerator().apply(v, img, uv, reg)
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   atol=0.02, rtol=0.05)
