"""On-device geometry: in-graph map rasterization parity + train-step path."""

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.geometry.landmarks import LM_REF, forehead_points
from blindshadowremoval_tpu.geometry.triangulation import (
    _with_anchors,
    build_triangulation,
    device_geometry_maps,
    generate_face_region,
    generate_offset_map,
    generate_uv_map,
)

import pytest

pytestmark = pytest.mark.slow   # in-graph rasterizer + full-forward compiles

S = 64


def _primitives(lms):
    fp = np.stack([np.concatenate([l, forehead_points(l, 0.8)], 0)
                   for l in lms])
    return (jnp.asarray(np.stack(lms)), jnp.asarray(fp),
            jnp.asarray(np.stack([build_triangulation(l).triangles
                                  for l in lms])),
            jnp.asarray(np.stack([build_triangulation(p).triangles
                                  for p in fp])),
            jnp.asarray(np.stack([build_triangulation(_with_anchors(l)).triangles
                                  for l in lms])))


def test_device_maps_match_host(rng):
    lms = [(LM_REF + rng.normal(scale=0.01, size=LM_REF.shape)
            ).astype(np.float32) for _ in range(2)]
    out = device_geometry_maps(*_primitives(lms), S)

    host_uv = np.stack([generate_uv_map(l, S) for l in lms])
    host_reg = np.stack([
        np.concatenate([generate_offset_map(l, LM_REF, S),
                        generate_offset_map(LM_REF, l, S)], axis=2)
        for l in lms])
    host_face = np.stack([generate_face_region(l, S) for l in lms])

    np.testing.assert_allclose(np.asarray(out["uv"]), host_uv, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["reg"]), host_reg, atol=1e-5)
    # face: binary rasterization can flip individual hull-boundary pixels
    assert np.abs(np.asarray(out["face"]) - host_face).max() < 5e-3


def test_train_step_with_device_geometry(rng):
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.train.trainer import Trainer

    cfg = get_config("train", img_size=S, batch_size=1,
                     compute_dtype="float32", device_geometry=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    lms = [(LM_REF + rng.normal(scale=0.01, size=LM_REF.shape)
            ).astype(np.float32) for _ in range(2)]
    lm, fp, uv_t, face_t, reg_t = _primitives(lms)
    b2 = 2
    batch = {
        "img_dark": jnp.asarray(rng.uniform(size=(b2, S, S, 3)).astype(np.float32)),
        "gt": jnp.asarray(rng.uniform(size=(b2, S, S, 3)).astype(np.float32)),
        "mask": jnp.asarray((rng.uniform(size=(b2, S, S, 1)) > 0.7).astype(np.float32)),
        "face": jnp.ones((b2, S, S, 1), jnp.float32),
        "lm": lm, "face_pts": fp, "uv_tris": uv_t,
        "face_tris": face_t, "reg_tris": reg_t,
    }
    new_state, losses, _ = trainer.train_step(
        state, batch, jax.random.PRNGKey(1), train=True)
    assert int(new_state.step) == 1
    for name, v in losses.items():
        assert np.isfinite(float(v)), name


def test_dataset_emits_primitives(tmp_path, rng):
    from PIL import Image

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.data.dataset import Dataset

    d = tmp_path / "id0"
    d.mkdir()
    img = (rng.uniform(size=(300, 300, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "f.png")
    lm = (LM_REF * 200 + 50).astype(np.float32)
    np.save(d / "f.npy", lm)

    cfg = get_config("train", img_size=S, batch_size=1,
                     data_dirs=(str(tmp_path / "*"),), device_geometry=True)
    ds = Dataset(cfg, "train", seed=0)
    sample = ds.parse_train(str(d))
    assert sample["lm"].shape == (2, 68, 2)
    assert sample["uv_tris"].dtype == np.int32
    assert sample["face_pts"].shape == (2, 85, 2)
    assert "uv" not in sample
