"""Fused single-call UCB eval vs the host-orchestrated pipeline.

The fused step (eval/fused.py) re-expresses the reference heuristics'
host control flow as in-graph selects and the dynamic crop-box resize as a
matmul.  On the reference-golden UCB images (whose host-path outputs are
themselves verified EXACTLY against the TF reference in
tests/test_tf_ref_e2e.py), the fused path must agree with the host path:
identical detected masks, matching composites and metrics.
"""

import os

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.data.dataset import Dataset
from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator
from blindshadowremoval_tpu.eval.fused import (
    dynamic_resize_matrix, resize_into_box)
from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.tf_checkpoint import (
    generator_mapping, load_weights_dict, synthetic_tf_weights)

pytestmark = pytest.mark.slow   # fused eval graph compiles (fwd+heuristics+CC)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "UCB")), reason="reference data absent")


def test_dynamic_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(256, 256, 3)).astype(np.float32)
    for size in (234, 200, 255, 256, 128):
        ref = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        ref = np.pad(ref, ((0, 256 - size), (0, 256 - size), (0, 0)))
        a = dynamic_resize_matrix(np.float32(size))
        out = np.asarray(resize_into_box(img, a))
        err = np.abs(out - ref).max()
        assert err < 1e-4, (size, err)   # f32 matmul accumulation order


@needs_ref
def test_fused_matches_host_pipeline(tmp_path):
    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "tf_ref", "e2e_eval.npz"))
    gen = GSCGenerator()
    z3 = np.zeros((1, 64, 64, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                         np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=0)
    weights["generator/clr_conv3/conv/bias"] = (
        weights["generator/clr_conv3/conv/bias"] + 0.5)
    variables = load_weights_dict(weights, variables, generator_mapping())

    cfg = get_config(
        "ucb", data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", part_mask_root=REF,
        checkpoint_dir=str(tmp_path))
    ds = Dataset(cfg, "test")
    ev = UCBEvaluator(cfg, variables)

    it = iter(ds)
    for i in range(len(golden["ucb_names"])):
        batch, _, name = next(it)
        box = golden[f"ucb{i}_box"]
        parts = ev._load_part_masks(REF, i)
        host = ev.run_one(batch, box, f"host{i}", parts)
        fused = ev.run_one_fused(batch, box, f"fused{i}", parts)

        assert (fused["detected"] == host["detected"]).all(), \
            f"ucb{i}: detected masks differ " \
            f"({(fused['detected'] != host['detected']).mean():.4f})"
        # fused pred egress is uint8 (metrics computed on-device pre-
        # quantization), so compare within half a quantization step + noise
        comp_err = np.abs(fused["pred"] - host["pred"]).max()
        assert comp_err <= 0.5 / 255 + 1e-4, f"ucb{i}: composite {comp_err}"
        assert abs(fused["psnr"] - host["psnr"]) < 0.01, i
        assert abs(fused["ssim"] - host["ssim"]) < 1e-4, i


@needs_ref
def test_fused_batched_matches_per_image(tmp_path):
    """run(images_per_call=k): k images per device call through the vmapped
    fused step (incl. a padded tail chunk) must reproduce the per-image
    fused outputs bit-for-bit — same step function, vmapped."""
    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "tf_ref", "e2e_eval.npz"))
    gen = GSCGenerator()
    z3 = np.zeros((1, 64, 64, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                         np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=0)
    weights["generator/clr_conv3/conv/bias"] = (
        weights["generator/clr_conv3/conv/bias"] + 0.5)
    variables = load_weights_dict(weights, variables, generator_mapping())

    cfg = get_config(
        "ucb", data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", part_mask_root=REF,
        checkpoint_dir=str(tmp_path))
    ds = Dataset(cfg, "test")
    ev = UCBEvaluator(cfg, variables)

    n = len(golden["ucb_names"])
    # k=2 over an odd count exercises the padded tail chunk
    batched = ev.run(ds, REF, images_per_call=2)[:n]

    it = iter(ds)
    for i in range(n):
        batch, box, name = next(it)
        parts = ev._load_part_masks(REF, i, sample_name=name)
        one = ev.run_one_fused(batch, box, f"b1_{i}", parts)
        assert (batched[i]["detected"] == one["detected"]).all(), i
        np.testing.assert_array_equal(batched[i]["pred"], one["pred"])
        assert abs(batched[i]["psnr"] - one["psnr"]) < 1e-3, i
        assert abs(batched[i]["ssim"] - one["ssim"]) < 1e-5, i


@needs_ref
def test_fused_matches_host_pipeline_tsm(tmp_path):
    """protocol="tsm" fuses the TSM UCB pipeline (full-res heuristics, flat
    threshold, composite-before-resize, frame=1 anchor+mirror forward); it
    must agree with the host-orchestrated run_one_tsm — whose outputs are
    verified EXACTLY against the TF reference in
    tests/test_tf_ref_e2e.py::test_tsm_ucb_protocol_parity."""
    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator

    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "tf_ref", "e2e_tsm_ucb.npz"))
    gen = TSMGenerator()
    z3 = np.zeros((2, 64, 64, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                         np.zeros((2, 64, 64, 6), np.float32), frame=2)
    weights = synthetic_tf_weights(variables, generator_mapping("tsm"),
                                   seed=0)
    weights["generator/clr_conv3/conv/bias"] = (
        weights["generator/clr_conv3/conv/bias"] + 0.5)
    variables = load_weights_dict(weights, variables,
                                  generator_mapping("tsm"))

    cfg = get_config(
        "ucb", variant="tsm",
        data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        compute_dtype="float32", part_mask_root=REF,
        checkpoint_dir=str(tmp_path))
    ds = Dataset(cfg, "test")
    ev = UCBEvaluator(cfg, variables)

    from blindshadowremoval_tpu.eval.postprocess import TSM_PARAMS

    it = iter(ds)
    for i in range(len(golden["tsm_names"])):
        batch, box, name = next(it)
        parts = ev._load_part_masks(REF, i)
        host = ev.run_one_tsm(batch, box, f"thost{i}", parts)
        fused = ev.run_one_fused(batch, box, f"tfused{i}", parts,
                                 params=TSM_PARAMS)
        assert (fused["detected"] == host["detected"]).all(), \
            f"tsm{i}: detected masks differ " \
            f"({(fused['detected'] != host['detected']).mean():.4f})"
        comp_err = np.abs(fused["pred"] - host["pred"]).max()
        assert comp_err <= 0.5 / 255 + 1e-4, f"tsm{i}: composite {comp_err}"
        assert abs(fused["psnr"] - host["psnr"]) < 0.01, i
        assert abs(fused["ssim"] - host["ssim"]) < 1e-4, i


@needs_ref
def test_fused_compact_ingress(tmp_path):
    """config.compact_ingress ships [0,1] view arrays as uint16 fixed-point
    (dequantized in-graph) and drops keys the graph never reads (reg/face
    for gsc).  The 1/65535 quantization must not move the detected mask and
    may move metrics only by far less than the bf16 compute noise the eval
    already tolerates."""
    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "tf_ref", "e2e_eval.npz"))
    gen = GSCGenerator()
    z3 = np.zeros((1, 64, 64, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                         np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=0)
    weights["generator/clr_conv3/conv/bias"] = (
        weights["generator/clr_conv3/conv/bias"] + 0.5)
    variables = load_weights_dict(weights, variables, generator_mapping())

    kw = dict(
        data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", part_mask_root=REF,
        checkpoint_dir=str(tmp_path))
    ev_f32 = UCBEvaluator(get_config("ucb", **kw), variables)
    ev_u16 = UCBEvaluator(get_config("ucb", compact_ingress=True, **kw),
                          variables)

    # the compact payload must actually be smaller: no reg/face, uint16
    ds = Dataset(ev_f32.config, "test")
    batch, _, name = next(iter(ds))
    jb = ev_u16._ingress(batch)
    assert set(jb) == {"img", "gt", "uv"}
    assert all(jb[k].dtype == np.uint16 for k in ("img", "gt", "uv"))
    full = sum(np.asarray(v).nbytes for v in batch.values())
    sent = sum(np.asarray(v).nbytes for v in jb.values())
    assert sent < full / 3, (sent, full)

    box = golden["ucb0_box"]
    parts = ev_f32._load_part_masks(REF, 0)
    a = ev_f32.run_one_fused(batch, box, "ci_f32", parts)
    b = ev_u16.run_one_fused(batch, box, "ci_u16", parts)
    assert (a["detected"] == b["detected"]).all()
    assert np.abs(a["pred"] - b["pred"]).max() <= 1.5 / 255
    assert abs(a["psnr"] - b["psnr"]) < 0.01
    assert abs(a["ssim"] - b["ssim"]) < 1e-4


@needs_ref
def test_fused_matches_host_pipeline_device_geometry(tmp_path):
    """Under config.device_geometry the fused step rasterizes the UV/offset
    maps in-graph; it must match the host-orchestrated devgeo path."""
    gen = GSCGenerator()
    z3 = np.zeros((1, 64, 64, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                         np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=0)
    weights["generator/clr_conv3/conv/bias"] = (
        weights["generator/clr_conv3/conv/bias"] + 0.5)
    variables = load_weights_dict(weights, variables, generator_mapping())

    cfg = get_config(
        "ucb", data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", part_mask_root=REF,
        device_geometry=True, checkpoint_dir=str(tmp_path))
    ds = Dataset(cfg, "test")
    ev = UCBEvaluator(cfg, variables)
    batch, box, name = next(iter(ds))
    parts = ev._load_part_masks(REF, 0)
    host = ev.run_one(batch, box, "dg_host", parts)
    fused = ev.run_one_fused(batch, box, "dg_fused", parts)
    assert (fused["detected"] == host["detected"]).all()
    assert np.abs(fused["pred"] - host["pred"]).max() <= 0.5 / 255 + 1e-4
    assert abs(fused["psnr"] - host["psnr"]) < 0.01
    assert abs(fused["ssim"] - host["ssim"]) < 1e-4
