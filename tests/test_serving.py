"""Serving engine + distributed helpers."""

import os

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.config import get_config

pytestmark = pytest.mark.slow   # warm-path service compiles (batched fwd x configs)

SAMPLE = "/root/reference/sample_imgs/02165"
S = 64


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_serving_end_to_end():
    from PIL import Image

    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.train.trainer import build_generator

    cfg = get_config("in_the_wild", img_size=S, compute_dtype="float32")
    gen = build_generator(cfg)
    z = np.zeros((1, S, S, 3), np.float32)
    zr = np.zeros((1, S, S, 6), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z, z, zr)

    # compact egress explicitly on (the CLI's configuration; the library
    # default is f32 so the numeric contract is opt-in)
    svc = ShadowRemovalService(cfg, variables, batch_size=4,
                               compact_output=True)
    img = np.asarray(Image.open(os.path.join(SAMPLE, "02165.png"))
                     .convert("RGB"), np.float32) / 255.0
    lm = np.load(os.path.join(SAMPLE, "02165.npy"))

    # 5 requests through a batch-4 service: one full batch + padded tail
    out = svc.remove_shadows([img] * 5, [lm] * 5)
    assert len(out) == 5
    for r in out:
        assert r["pred"].shape == (S, S, 3)
        assert r["mask_pred"].shape == (S, S, 1)
        assert np.isfinite(r["pred"]).all()
    # identical inputs -> identical outputs regardless of batch position
    np.testing.assert_allclose(out[0]["pred"], out[4]["pred"], atol=1e-5)

    # device-rasterized geometry + uint8/f16 egress matches the host-map
    # f32 path within output quantization (1/255)
    svc_full = ShadowRemovalService(cfg, variables, batch_size=4,
                                    compact_output=False,
                                    device_geometry=False)
    ref = svc_full.remove_shadows([img], [lm])[0]
    assert ref["pred"].dtype == np.float32
    np.testing.assert_allclose(out[0]["pred"], ref["pred"], atol=1.0 / 255)
    np.testing.assert_allclose(out[0]["mask_pred"], ref["mask_pred"],
                               atol=2e-3)


def test_serving_device_geometry_synthetic():
    """The default path (device geometry + compact egress) on synthetic
    landmarks — coverage that doesn't depend on the /root/reference fixture."""
    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.train.trainer import build_generator

    cfg = get_config("in_the_wild", img_size=S, compute_dtype="float32")
    gen = build_generator(cfg)
    z = np.zeros((1, S, S, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z, z,
                         np.zeros((1, S, S, 6), np.float32))

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(400, 400, 3)).astype(np.float32)
    # plausible face: landmarks spread over a central box (non-degenerate
    # for qhull), jaw ordering irrelevant to the triangulation
    lm = rng.uniform(120, 280, size=(68, 2)).astype(np.float32)

    svc = ShadowRemovalService(cfg, variables, batch_size=2)
    out = svc.remove_shadows([img] * 3, [lm] * 3)   # full batch + padded tail
    assert len(out) == 3
    for r in out:
        assert r["pred"].shape == (S, S, 3) and r["pred"].dtype == np.float32
        assert np.isfinite(r["pred"]).all()
        assert np.isfinite(r["mask_pred"]).all()
    np.testing.assert_allclose(out[0]["pred"], out[2]["pred"], atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_serving_tail_batch_matches_evaluator():
    """The padded-tail + compact_output round trip against the evaluator
    path: an image served in the PADDED TAIL of a batch (N % batch != 0),
    with device_geometry on and off, must match InTheWildEvaluator's
    per-image output for the same image within egress quantization."""
    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.eval.evaluators import InTheWildEvaluator
    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.train.trainer import build_generator
    from PIL import Image

    cfg = get_config("in_the_wild", img_size=S, compute_dtype="float32",
                     eval_views=1,
                     data_dirs_test=(os.path.dirname(SAMPLE) + "/*",),
                     checkpoint_dir="/tmp/serving_tail_test")
    gen = build_generator(cfg)
    z = np.zeros((1, S, S, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z, z,
                         np.zeros((1, S, S, 6), np.float32))

    batch, box, name = next(iter(Dataset(cfg, "test")))
    ev = InTheWildEvaluator(cfg, variables)
    ref = ev.run_one(batch, box, "tail_ref")

    img = np.asarray(Image.open(os.path.join(SAMPLE, "02165.png"))
                     .convert("RGB"), np.float32) / 255.0
    lm = np.load(os.path.join(SAMPLE, "02165.npy"))
    for devgeo, compact, atol_pred, atol_mask in (
            (False, False, 1e-5, 1e-5),
            (True, False, 5e-3, 5e-3),      # different rasterizer backend
            (True, True, 1.0 / 255 + 5e-3, 6e-3)):
        svc = ShadowRemovalService(cfg, variables, batch_size=4,
                                   compact_output=compact,
                                   device_geometry=devgeo)
        outs = svc.remove_shadows([img] * 5, [lm] * 5)   # 5 % 4 -> tail of 1
        tail = outs[4]
        np.testing.assert_allclose(tail["pred"], np.clip(ref["pred"], 0, 1),
                                   atol=atol_pred)
        np.testing.assert_allclose(tail["mask_pred"], ref["mask_pred"],
                                   atol=atol_mask)


def test_serving_compact_ingress_parity():
    """compact_ingress ships the request image (and uv in host-geometry
    mode) as uint16 fixed-point; outputs must match the f32-ingress path
    within the 1/65535 quantization's propagated effect."""
    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.train.trainer import build_generator

    cfg = get_config("in_the_wild", img_size=S, compute_dtype="float32")
    gen = build_generator(cfg)
    z = np.zeros((1, S, S, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z, z,
                         np.zeros((1, S, S, 6), np.float32))

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(400, 400, 3)).astype(np.float32)
    lm = rng.uniform(120, 280, size=(68, 2)).astype(np.float32)

    for devgeo in (True, False):
        a = ShadowRemovalService(cfg, variables, batch_size=2,
                                 device_geometry=devgeo)
        b = ShadowRemovalService(cfg, variables, batch_size=2,
                                 device_geometry=devgeo,
                                 compact_ingress=True)
        ra = a.remove_shadows([img] * 3, [lm] * 3)
        rb = b.remove_shadows([img] * 3, [lm] * 3)
        for x, y in zip(ra, rb):
            np.testing.assert_allclose(x["pred"], y["pred"], atol=1e-3)
            np.testing.assert_allclose(x["mask_pred"], y["mask_pred"],
                                       atol=1e-3)


def test_host_local_batch_single_process():
    from blindshadowremoval_tpu.parallel.distributed import (
        global_mesh,
        host_local_batch,
        initialize,
    )

    initialize()   # no-op single process
    local, offset = host_local_batch(16)
    assert local == 16 and offset == 0
    mesh = global_mesh((8, 1))
    assert mesh.shape["data"] == 8
