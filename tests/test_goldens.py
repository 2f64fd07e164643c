"""Golden regression fixtures: detect unintended numeric drift.

Regenerate deliberately with `python tools/make_goldens.py` after an
intentional numerics change (tolerances are float16-storage sized).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # golden-fixture full-pipeline runs

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "goldens.npz")
S = 64

needs_golden = pytest.mark.skipif(not os.path.isfile(GOLDEN),
                                  reason="goldens not generated")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


@needs_golden
def test_geometry_goldens(g):
    from blindshadowremoval_tpu.geometry.landmarks import LM_REF
    from blindshadowremoval_tpu.geometry.triangulation import (
        generate_face_region,
        generate_offset_map,
        generate_uv_map,
    )

    lm = g["lm"]
    np.testing.assert_allclose(generate_uv_map(lm, S), g["uv"], atol=2e-3)
    np.testing.assert_allclose(generate_offset_map(lm, LM_REF, S), g["off"],
                               atol=2e-3)
    np.testing.assert_allclose(generate_face_region(lm, S), g["face"],
                               atol=2e-3)


@needs_golden
def test_synthesis_goldens(g):
    from blindshadowremoval_tpu.ops.perlin import render_perlin_mask
    from blindshadowremoval_tpu.ops.ssscatter import apply_ss_shadow_map

    pmask = np.asarray(render_perlin_mask(jax.random.PRNGKey(7), (S, S)))
    np.testing.assert_allclose(pmask, g["pmask"], atol=2e-3)
    ss = np.asarray(apply_ss_shadow_map(jax.random.PRNGKey(8),
                                        jnp.asarray(g["pmask"].astype(np.float32))))
    np.testing.assert_allclose(ss, g["ss"], atol=4e-3)


@needs_golden
def test_compose_golden(g):
    from blindshadowremoval_tpu.data.synthesis import compose_shadow_image

    rng = np.random.default_rng(123)
    _ = rng.normal(scale=0.01, size=(68, 2))          # keep stream aligned
    gt = rng.uniform(size=(2, S, S, 3)).astype(np.float32)
    dark = (gt * 0.6).astype(np.float32)
    mask = (rng.uniform(size=(2, S, S, 1)) > 0.7).astype(np.float32)
    facex = np.broadcast_to(g["face"].astype(np.float32)[None, :, :, :1],
                            (2, S, S, 1))
    img, mask_sv, _ = compose_shadow_image(
        jax.random.PRNGKey(9), jnp.asarray(mask), jnp.asarray(gt),
        jnp.asarray(np.ascontiguousarray(dark)),
        jnp.asarray(np.ascontiguousarray(facex)))
    np.testing.assert_allclose(np.asarray(img), g["synth_img"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(mask_sv), g["synth_mask_sv"],
                               atol=5e-3)


@needs_golden
def test_generator_forward_golden(g):
    from blindshadowremoval_tpu.geometry.landmarks import LM_REF
    from blindshadowremoval_tpu.models.generator import GSCGenerator

    rng = np.random.default_rng(123)
    _ = rng.normal(scale=0.01, size=(68, 2))
    gt = rng.uniform(size=(2, S, S, 3)).astype(np.float32)

    gen = GSCGenerator()
    off = g["off"].astype(np.float32)
    reg = np.concatenate([off, off], axis=2)[None]
    uv = g["uv"].astype(np.float32)[None]
    inp = gt[:1]
    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(inp),
                         jnp.asarray(uv), jnp.asarray(reg))
    _, rgb, _, dif = gen.apply(variables, jnp.asarray(inp), jnp.asarray(uv),
                               jnp.asarray(reg))
    np.testing.assert_allclose(np.asarray(rgb), g["gen_rgb"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(dif), g["gen_dif"], atol=5e-3)
