"""Heuristic-branch-coverage goldens: every UCB post-processing gate.

The 3-image e2e fixture (test_tf_ref_e2e.py) cannot fire all ~16 magic-
number gates in the reference's UCB post-processor
(train_test_GSC.py:480-663).  This suite replays the branch-case fixture
(goldens/tf_ref/branch_cases.npz, tools/make_tf_ref_branch_goldens.py):
real UCB images plus deterministic part-mask rectangle edits chosen so
every gate fires on at least one case, with the golden outputs produced by
*running the reference's own FSRNet.test_step* on the identical inputs.

Per case this asserts
  * output parity: detected-mask disagreement <= 1%, composite >= 40 dB,
    metric deltas tight — same bars as the e2e suite;
  * the branch report: the instrumented post-processor says the fixture's
    certified branches fired;
  * liveness: disabling each certified branch changes the detected mask —
    so output equality proves the REFERENCE fired that branch too.

Finally the union of certified branches must cover GSC_BRANCHES, so no
heuristic gate is golden-untested.
"""

import os

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.data.dataset import Dataset
from blindshadowremoval_tpu.eval.branch_probes import (apply_rects,
                                                       disable_branch)
from blindshadowremoval_tpu.eval.evaluators import (UCBEvaluator, _pad_to,
                                                    _resize_np)
from blindshadowremoval_tpu.eval.postprocess import (GSC_BRANCHES,
                                                     PostprocessParams,
                                                     composite,
                                                     ucb_postprocess)
from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.tf_checkpoint import (
    generator_mapping, load_weights_dict, synthetic_tf_weights)

pytestmark = pytest.mark.slow   # reference-golden pipeline (~2 min)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tf_ref",
                      "branch_cases.npz")
REF = "/root/reference"

needs_fixture = pytest.mark.skipif(
    not (os.path.exists(GOLDEN)
         and os.path.isdir(os.path.join(REF, "UCB"))),
    reason="branch fixture or reference data absent")


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 99.0 if mse == 0 else float(10.0 * np.log10(1.0 / mse))


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Bridged synthetic-ckpt-94 evaluators (one per RGB-head bias variant
    used by the fixture) + a per-image forward cache."""
    cfg = get_config(
        "ucb",
        data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", part_mask_root=REF,
        checkpoint_dir=str(tmp_path_factory.mktemp("branch")))
    it = iter(Dataset(cfg, "test"))
    state = {"next": 0, "cache": {}, "evs": {}}

    def evaluator(bias: float) -> UCBEvaluator:
        """UCBEvaluator under seed-0 synthetic weights with the RGB-head
        bias lifted by `bias` — identical to the fixture generator."""
        if bias not in state["evs"]:
            gen = GSCGenerator()
            z3 = np.zeros((1, 64, 64, 3), np.float32)
            variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                                 np.zeros((1, 64, 64, 6), np.float32))
            weights = synthetic_tf_weights(variables, generator_mapping(),
                                           seed=0)
            weights["generator/clr_conv3/conv/bias"] = (
                weights["generator/clr_conv3/conv/bias"] + bias)
            state["evs"][bias] = UCBEvaluator(cfg, load_weights_dict(
                weights, variables, generator_mapping()))
        return state["evs"][bias]

    def prepped(idx: int, box, bias: float):
        """(pred, mp, tmp) for image idx under the bias variant, resized
        into the golden's box."""
        while state["next"] <= idx:
            batch, _, _ = next(it)
            state["cache"][state["next"]] = batch
            state["next"] += 1
        batch = state["cache"][idx]
        size = int(min(box[3] - box[1], 256))
        _, rgb, _, mask_pred, _ = evaluator(bias).forward(batch, frame=4)
        tmp = _pad_to(_resize_np(batch["img"][0], size), 256)
        pred = _pad_to(_resize_np(np.clip(rgb[0], 0, 1), size), 256)
        mp = _pad_to(_resize_np(mask_pred[0], size), 256)
        mp = np.repeat(mp, 3, axis=2) if mp.shape[2] == 1 else mp
        return pred, mp, tmp, size

    return evaluator, prepped


def _heuristics(ev, mp, tmp, parts, size, params, report=None):
    part = ev._resized_parts(parts, size)
    return ucb_postprocess(
        mp, tmp, part["face_hair"], part["face_no_hair"], part["mouth"],
        part["nose"], part["eyebrow"], part["eye"], part["glasses"],
        params, report=report)


TSM_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tf_ref",
                          "tsm_branch_cases.npz")

needs_tsm_fixture = pytest.mark.skipif(
    not (os.path.exists(TSM_GOLDEN)
         and os.path.isdir(os.path.join(REF, "UCB"))),
    reason="TSM branch fixture or reference data absent")


@pytest.fixture(scope="module")
def tsm_pipeline(tmp_path_factory):
    """Bridged synthetic TSM evaluator + per-image full-res forward cache
    (the TSM protocol runs its heuristics at 256², train_with_TSM.py:495)."""
    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator

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
        checkpoint_dir=str(tmp_path_factory.mktemp("tsm_branch")))
    ev = UCBEvaluator(cfg, variables)
    it = iter(Dataset(cfg, "test"))
    state = {"next": 0, "cache": {}}

    def prepped(idx: int):
        while state["next"] <= idx:
            batch, _, _ = next(it)
            _, rgb, _, mask_pred, _ = ev.forward(batch, frame=1)
            tmp = np.asarray(batch["img"][0], np.float32)
            pred = np.asarray(rgb[0], np.float32)   # raw (:583)
            mp = np.asarray(mask_pred[0], np.float32)
            mp = np.repeat(mp, 3, axis=2) if mp.shape[2] == 1 else mp
            state["cache"][state["next"]] = (pred, mp, tmp)
            state["next"] += 1
        return state["cache"][idx]

    return ev, prepped


def _tsm_heuristics(mp, tmp, parts, params, report=None):
    """Full-res TSM heuristics: the part masks are NOT resized
    (train_with_TSM.py:455-469 commented out)."""
    return ucb_postprocess(
        mp, tmp, parts["face_hair"], parts["face_no_hair"], parts["mouth"],
        parts["nose"], parts["eyebrow"], parts["eye"], parts["glasses"],
        params, report=report)


@needs_tsm_fixture
def test_tsm_branch_golden_parity_and_coverage(tsm_pipeline):
    """Every TSM-protocol gate (the 0.6 min-frac drop, hair veto, all four
    nose-fraction bands, both veto reaches — train_with_TSM.py:536-565)
    certified against the reference's own TSM test_step."""
    from blindshadowremoval_tpu.eval.postprocess import (TSM_BRANCHES,
                                                         TSM_PARAMS)

    golden = np.load(TSM_GOLDEN)
    ev, prepped = tsm_pipeline
    case_ids = [str(c) for c in golden["case_ids"]]
    assert case_ids, "empty fixture"
    covered = set()
    for cid in case_ids:
        idx = int(golden[f"{cid}_image_idx"])
        box = np.asarray(golden[f"{cid}_box"], np.float32)
        rects = np.asarray(golden[f"{cid}_rects"], np.int32).reshape(-1, 6)
        branches = [str(b) for b in golden[f"{cid}_branches"]]

        pred, mp, tmp = prepped(idx)
        # positional pairing replays the fixture generator's iteration order
        parts = ev._load_part_masks(REF, idx)
        if len(rects):
            parts = apply_rects(parts, rects)
        report = {}
        detected, _ = _tsm_heuristics(mp, tmp, parts, TSM_PARAMS,
                                      report=report)
        # composite at full res, clip, THEN resize into the box + pad
        # (train_with_TSM.py:583,592-593)
        size = int(min(box[3] - box[1], 256))
        out = np.clip(pred * detected + tmp * (1.0 - detected), 0.0, 1.0)
        out = _pad_to(_resize_np(out, size), 256)

        ref_detected = np.unpackbits(
            golden[f"{cid}_detected"])[:256 * 256].reshape(256, 256)
        mine = (detected[..., 0] > 0.5).astype(np.uint8)
        disagree = float(np.mean(mine != ref_detected))
        psnr_comp = _psnr(out, golden[f"{cid}_composite"])
        print(f"{cid} (image {idx}, {len(rects)} rects): "
              f"disagree {disagree:.4f}, composite {psnr_comp:.2f} dB, "
              f"branches {branches}")
        assert disagree <= 0.01, f"{cid} detected mask {disagree:.4f}"
        assert psnr_comp >= 40.0, f"{cid} composite {psnr_comp:.2f} dB"

        for b in branches:
            assert report.get(b, False), \
                f"{cid}: fixture certifies {b} but the report says it " \
                f"did not fire"
            off, _ = _tsm_heuristics(mp, tmp, parts,
                                     disable_branch(TSM_PARAMS, b))
            assert np.any(detected != off), \
                f"{cid}: disabling {b} does not change the output"
        covered |= set(branches)

    missing = [b for b in TSM_BRANCHES if b not in covered]
    print(f"TSM branch coverage {len(covered)}/{len(TSM_BRANCHES)}; "
          f"missing: {missing}")
    assert not missing, f"golden-untested TSM heuristic branches: {missing}"


@needs_fixture
def test_branch_golden_parity_and_coverage(golden, pipeline):
    evaluator, prepped = pipeline
    case_ids = [str(c) for c in golden["case_ids"]]
    assert case_ids, "empty fixture"
    covered = set()
    for cid in case_ids:
        idx = int(golden[f"{cid}_image_idx"])
        bias = float(golden[f"{cid}_bias"])
        box = np.asarray(golden[f"{cid}_box"], np.float32)
        rects = np.asarray(golden[f"{cid}_rects"], np.int32).reshape(-1, 6)
        branches = [str(b) for b in golden[f"{cid}_branches"]]

        ev = evaluator(bias)
        pred, mp, tmp, size = prepped(idx, box, bias)
        parts = ev._load_part_masks(REF, idx)
        if len(rects):
            parts = apply_rects(parts, rects)
        report = {}
        detected, _ = _heuristics(ev, mp, tmp, parts, size,
                                  PostprocessParams(), report=report)
        out = composite(pred, tmp, detected)

        ref_detected = np.unpackbits(
            golden[f"{cid}_detected"])[:256 * 256].reshape(256, 256)
        mine = (detected[..., 0] > 0.5).astype(np.uint8)
        disagree = float(np.mean(mine != ref_detected))
        psnr_comp = _psnr(out, golden[f"{cid}_composite"])
        print(f"{cid} (image {idx}, bias {bias}, {len(rects)} rects): "
              f"disagree {disagree:.4f}, composite {psnr_comp:.2f} dB, "
              f"branches {branches}")
        assert disagree <= 0.01, f"{cid} detected mask {disagree:.4f}"
        assert psnr_comp >= 40.0, f"{cid} composite {psnr_comp:.2f} dB"

        for b in branches:
            assert report.get(b, False), \
                f"{cid}: fixture certifies {b} but the report says it " \
                f"did not fire"
            off, _ = _heuristics(ev, mp, tmp, parts, size,
                                 disable_branch(PostprocessParams(), b))
            assert np.any(detected != off), \
                f"{cid}: disabling {b} does not change the output — " \
                f"liveness lost, the golden no longer certifies it"
        covered |= set(branches)

    missing = [b for b in GSC_BRANCHES if b not in covered]
    print(f"branch coverage {len(covered)}/{len(GSC_BRANCHES)}; "
          f"missing: {missing}")
    assert not missing, f"golden-untested heuristic branches: {missing}"
