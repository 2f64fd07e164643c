"""Evaluators end-to-end on the real sample fixture + synthetic SFW/UCB
fixtures (the reference ships runnable fixtures in sample_imgs/,
SURVEY.md §4.3)."""

import os
import shutil

import jax
import numpy as np
import pytest

from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.data.dataset import Dataset, pack_views, unpack_views

pytestmark = pytest.mark.slow   # evaluator forwards compile per protocol

SAMPLE = "/root/reference/sample_imgs/02165"
S = 64   # small eval resolution for CPU-speed tests


def _small_config(tmp, mode, **kw):
    return get_config(mode, img_size=S, compute_dtype="float32",
                      checkpoint_dir=str(tmp), **kw)


def _variables(cfg):
    from blindshadowremoval_tpu.train.trainer import build_generator

    gen = build_generator(cfg)
    img = np.zeros((2, S, S, 3), np.float32)
    reg = np.zeros((2, S, S, 6), np.float32)
    if cfg.variant == "tsm":
        return gen.init(jax.random.PRNGKey(0), img, img, reg, frame=2)
    return gen.init(jax.random.PRNGKey(0), img, img, reg)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_ffhq_dataset_and_eval(tmp_path):
    from blindshadowremoval_tpu.eval.evaluators import InTheWildEvaluator

    cfg = _small_config(tmp_path, "in_the_wild",
                        data_dirs_test=("/root/reference/sample_imgs/*",))
    ds = Dataset(cfg, "test")
    assert len(ds.name_list) == 1
    batch, box, name = next(iter(ds))
    assert batch["img"].shape == (10, S, S, 3)
    # gt == input for in-the-wild (dataset.py:622-623)
    np.testing.assert_allclose(batch["gt"][0], batch["img"][0])
    assert batch["reg"].shape == (10, S, S, 6)

    ev = InTheWildEvaluator(cfg, _variables(cfg))
    out = ev.run(ds)
    assert len(out) == 1
    assert os.path.isfile(out[0]["result_path"])
    assert out[0]["pred"].shape == (S, S, 3)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_ffhq_eval_device_geometry_parity(tmp_path):
    """Eval with in-graph geometry rasterization matches the host-map path
    (same seed -> same views; the rasterizers are numerically identical)."""
    from blindshadowremoval_tpu.eval.evaluators import InTheWildEvaluator

    outs = []
    for devgeo in (False, True):
        cfg = _small_config(
            tmp_path / f"devgeo{devgeo}", "in_the_wild",
            data_dirs_test=("/root/reference/sample_imgs/*",),
            eval_views=1, device_geometry=devgeo)
        ds = Dataset(cfg, "test", seed=0)
        batch, box, name = next(iter(ds))
        if devgeo:
            assert "uv" not in batch and batch["uv_tris"].dtype == np.int32
        ev = InTheWildEvaluator(cfg, _variables(cfg))
        outs.append(ev.run_one(batch, box, name))
    np.testing.assert_allclose(outs[0]["pred"], outs[1]["pred"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(outs[0]["mask_pred"], outs[1]["mask_pred"],
                               atol=1e-4, rtol=1e-4)


def test_pack_unpack_roundtrip(rng):
    view = {
        "img": rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
        "gt": rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
        "uv": rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
        "reg": rng.uniform(size=(2, 8, 8, 6)).astype(np.float32),
        "face": rng.uniform(size=(2, 8, 8, 1)).astype(np.float32),
    }
    packed = pack_views(view)
    assert packed.shape == (2, 8, 8, 16)    # the reference's test layout
    back = unpack_views(packed)
    for k in view:
        np.testing.assert_allclose(back[k], view[k])


def _make_sfw_fixture(tmp_path):
    """Synthetic SFW video dir: frames 1..20 with lm/label/cmap."""
    import cv2

    src_img = cv2.imread(os.path.join(SAMPLE, "02165.png"))
    lm = np.load(os.path.join(SAMPLE, "02165.npy"))
    vid = tmp_path / "sfw" / "vid1"
    vid.mkdir(parents=True)
    label = np.zeros(src_img.shape[:2], np.uint8)
    label[60:120, 60:120] = 2
    label[130:150, 130:150] = 1
    for fr in range(1, 21):
        cv2.imwrite(str(vid / f"{fr}.png"), src_img)
        np.save(str(vid / f"{fr}.npy"), lm)
        cv2.imwrite(str(vid / f"{fr}_label.png"), label)
        # cmap naming rides the mask stem (dataset_with_TSM.py:231)
        cv2.imwrite(str(vid / f"{fr}_label_cmap.png"), src_img)
    return str(tmp_path / "sfw" / "*")


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_sfw_eval(tmp_path):
    from blindshadowremoval_tpu.eval.evaluators import SFWEvaluator

    pattern = _make_sfw_fixture(tmp_path)
    cfg = _small_config(tmp_path / "ckpt", "sfw", data_dirs_test=(pattern,))
    ds = Dataset(cfg, "test", dset="sfw")
    assert len(ds.name_list) == 20
    name = ds.name_list[0]
    batch, box = ds.parse_test_sfw(name)
    assert batch["img"].shape == (2, S, S, 3)
    assert batch["label"].shape == (2, S, S, 1)
    assert set(np.unique(batch["label"][0]).astype(int)) <= {0, 1, 2}

    ev = SFWEvaluator(cfg, _variables(cfg))
    r = ev.run_one(batch, box, name)
    assert 0.0 <= r["auc"] <= 1.0
    assert np.isfinite(r["psnr"]) and np.isfinite(r["ssim"])


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_sfw_video_schedule_and_eval(tmp_path):
    from blindshadowremoval_tpu.eval.evaluators import SFWVideoEvaluator

    # schedule matches the reference's banding (dataset.py:808-867)
    assert Dataset.video_frame_schedule(1)[:3] == [1, 3, 5]
    assert Dataset.video_frame_schedule(10)[-1] == 2
    assert Dataset.video_frame_schedule(101)[1] == 100
    # every branch of the reference's frame-offset table (dataset.py:808-867)
    assert Dataset.video_frame_schedule(1) == [1, 3, 5, 7, 9, 11, 13, 15, 17, 2]
    assert Dataset.video_frame_schedule(3) == [3, 4, 6, 8, 10, 12, 14, 16, 18, 1]
    assert Dataset.video_frame_schedule(5) == [5, 6, 8, 10, 12, 14, 16, 18, 3, 1]
    assert Dataset.video_frame_schedule(7) == [7, 8, 10, 12, 14, 16, 18, 5, 3, 1]
    assert Dataset.video_frame_schedule(50) == [50, 51, 53, 55, 57, 59,
                                                48, 46, 44, 42]
    assert Dataset.video_frame_schedule(101) == [101, 100, 98, 96, 94, 92,
                                                 90, 99, 97, 95]

    pattern = _make_sfw_fixture(tmp_path)
    cfg = _small_config(tmp_path / "ckpt", "sfw_video",
                        data_dirs_test=(pattern,))
    ds = Dataset(cfg, "test", dset="sfw")
    name = ds.name_list[8]  # frame 9
    batch, box = ds.parse_test_sfw_video(name)
    assert batch["img"].shape == (10, S, S, 3)

    ev = SFWVideoEvaluator(cfg, _variables(cfg))
    r = ev.run_one(batch, box, name,
                   export_bbox_dir=str(tmp_path / "bbox"))
    assert r["pred"].shape == (10, S, S, 3)
    assert len(os.listdir(tmp_path / "bbox")) == 1

    # end-of-video anchors: scheduled offsets past the last frame clamp to
    # the available range (the reference input()-BLOCKS on missing frames,
    # dataset.py:871-874) — anchor 19 of this 20-frame clip schedules up to
    # frame 28, which must resolve without error
    batch, box = ds.parse_test_sfw_video(ds.name_list[-1])
    assert batch["img"].shape == (10, S, S, 3)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_sfw_auc_probe(tmp_path):
    """The select-best AUC probe (fit --probe-metric auc): SFW frames parse
    once, per-'epoch' only the variables swap, and the score equals the mean
    of SFWEvaluator's own per-frame AUC on the same frames."""
    import types

    from blindshadowremoval_tpu.eval.evaluators import SFWEvaluator
    from blindshadowremoval_tpu.train.loop import _SFWProbe

    pattern = _make_sfw_fixture(tmp_path)
    cfg = _small_config(tmp_path / "ckpt", "train", variant="tsm",
                        data_dirs_test=(pattern,))
    variables = _variables(cfg)
    state = types.SimpleNamespace(
        gen_params=variables["params"],
        gen_stats=variables.get("batch_stats", {}))

    probe = _SFWProbe(cfg, n_images=2)
    score = probe(state)
    assert 0.0 <= score <= 1.0

    # oracle: the full evaluator's AUC on the same frames
    ev_cfg = _small_config(tmp_path / "ckpt2", "sfw", variant="tsm",
                           data_dirs_test=(pattern,))
    ev = SFWEvaluator(ev_cfg, variables)
    ds = Dataset(ev_cfg, "test", dset="sfw", seed=0)
    it = iter(ds)
    aucs = [ev.run_one(*next(it))["auc"] for _ in range(2)]
    np.testing.assert_allclose(score, np.mean(aucs), atol=1e-6)

    # a second call with different params must move the score (variables
    # really swap between epochs)
    state2 = types.SimpleNamespace(
        gen_params=jax.tree.map(lambda x: -x, variables["params"]),
        gen_stats=variables.get("batch_stats", {}))
    score2 = probe(state2)
    assert score2 != score


def test_sfw_auc_probe_requires_data(tmp_path):
    from blindshadowremoval_tpu.train.loop import _SFWProbe

    cfg = _small_config(tmp_path, "train", data_dirs_test=())
    with pytest.raises(ValueError):
        _SFWProbe(cfg, n_images=2)


def _make_ucb_fixture(tmp_path):
    """UCB layout: <root>/input/<id>/x.{png,npy}, <root>/gt/<id>/x.png,
    plus the 7 part-mask dirs with one 256x256 mask each."""
    import cv2

    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    src_img = cv2.imread(os.path.join(SAMPLE, "02165.png"))
    lm = np.load(os.path.join(SAMPLE, "02165.npy"))
    inp = tmp_path / "ucb" / "input" / "id1"
    gt = tmp_path / "ucb" / "gt" / "id1"
    inp.mkdir(parents=True)
    gt.mkdir(parents=True)
    cv2.imwrite(str(inp / "x.png"), src_img)
    np.save(str(inp / "x.npy"), lm)
    cv2.imwrite(str(gt / "x.png"), src_img)

    h, w = 256, 256
    masks = {
        "face_hair": ((20, 240), (30, 230)),
        "face_no_hair": ((40, 230), (40, 220)),
        "mouth": ((170, 200), (100, 160)),
        "nose": ((110, 165), (110, 145)),
        "eyebrow": ((70, 85), (60, 200)),
        "eye": ((90, 105), (60, 200)),
        "glasses": ((88, 108), (55, 205)),
    }
    for key, ((r0, r1), (c0, c1)) in masks.items():
        d = tmp_path / "ucb" / UCBEvaluator.PART_DIRS[key]
        d.mkdir(parents=True)
        m = np.zeros((h, w, 3), np.uint8)
        m[r0:r1, c0:c1] = 255
        # the reference fixtures' name-keyed scheme: <id>_<stem>-result.png
        cv2.imwrite(str(d / "id1_x-result.png"), m)
    return str(tmp_path / "ucb")


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_ucb_eval(tmp_path):
    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    root = _make_ucb_fixture(tmp_path)
    cfg = _small_config(tmp_path / "ckpt", "ucb",
                        data_dirs_test=(root + "/input/*",),
                        part_mask_root=root)
    ds = Dataset(cfg, "test")
    assert len(ds.name_list) == 1

    ev = UCBEvaluator(cfg, _variables(cfg))
    results = ev.run(ds, root)
    assert len(results) == 1
    r = results[0]
    assert np.isfinite(r["psnr"]) and np.isfinite(r["ssim"])
    assert r["detected"].shape == (S, S, 3) or r["detected"].shape == (256, 256, 3)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_ucb_eval_single_view(tmp_path):
    """config.eval_views=1: dataset yields only the anchor and the evaluator
    runs the full protocol on it (the 9 refs only influence tsm)."""
    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    root = _make_ucb_fixture(tmp_path)
    cfg = _small_config(tmp_path / "ckpt", "ucb",
                        data_dirs_test=(root + "/input/*",),
                        part_mask_root=root, eval_views=1)
    ds = Dataset(cfg, "test")
    batch, box, name = next(iter(ds))
    assert batch["img"].shape[0] == 1

    ev = UCBEvaluator(cfg, _variables(cfg))
    r = ev.run_one(batch, box, name, ev._load_part_masks(root, 0))
    assert np.isfinite(r["psnr"]) and np.isfinite(r["ssim"])


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_ucb_eval_name_keyed_refuses_mismatch(tmp_path):
    """The run() default is name-keyed part-mask pairing: a mask directory
    whose filenames don't match `<id>_<stem>-result.png` must raise instead
    of silently pairing by position (VERDICT r3 weak #6)."""
    import cv2

    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    root = _make_ucb_fixture(tmp_path)
    # sabotage one directory: rename its mask to a positional-style name
    d = os.path.join(root, UCBEvaluator.PART_DIRS["nose"])
    os.rename(os.path.join(d, "id1_x-result.png"),
              os.path.join(d, "something_else.png"))
    cfg = _small_config(tmp_path / "ckpt", "ucb",
                        data_dirs_test=(root + "/input/*",),
                        part_mask_root=root)
    ds = Dataset(cfg, "test")
    ev = UCBEvaluator(cfg, _variables(cfg))
    with pytest.raises(FileNotFoundError, match="key_masks_by_name"):
        ev.run(ds, root)


def test_ucb_gt_path():
    assert Dataset._ucb_gt_path("UCB/train/input/9156/9156-004.npy") == \
        "UCB/train/gt/9156/9156-004.png"


def test_ucb_postprocess_nose_veto_writes(rng):
    """Regression: the nose veto writes into the component-filtered mask,
    which must be a writable copy of the device array (it crashed read-only
    when the veto's shadow-fraction band was hit on real data)."""
    from blindshadowremoval_tpu.eval.postprocess import (
        PostprocessParams,
        ucb_postprocess,
    )

    s = 64
    mp = np.zeros((s, s, 3), np.float32)
    mp[8:40, 8:40] = 0.5                       # one strong shadow blob
    img = np.full((s, s, 3), 0.5, np.float32)
    ones = np.ones((s, s, 3), np.float32)
    zeros = np.zeros((s, s, 3), np.float32)
    nose = np.zeros((s, s, 3), np.float32)
    nose[35:45, 30:40] = 1.0                   # nose half inside the blob
    # wide band so the 0.5 shadow fraction hits the veto branch
    params = PostprocessParams(nose_frac_bands=((0.1, 0.9),))
    detected, _ = ucb_postprocess(
        mp, img, ones, ones, zeros, nose, zeros, zeros, zeros, params)
    assert detected.shape == (s, s, 3)
    # the veto zeroed the rows below mid-nose inside the blob
    assert detected[39, 30:40].sum() == 0.0
    assert detected[20, 30:40].sum() > 0.0


def test_part_masks_keyed_by_filename():
    """Filename keying pairs `<id>_<stem>-result.png` to the sample, and
    raises loudly on a missing mask (the positional default silently
    misaligns — reference-faithful, train_test_GSC.py:372,387-393)."""
    import pytest as _pytest

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "UCB")):
        _pytest.skip("reference data absent")
    ev = UCBEvaluator.__new__(UCBEvaluator)   # only _load_part_masks needed
    by_name = ev._load_part_masks(
        ref, 0, sample_name=ref + "/UCB/train/input/9156/9156-004.npy")
    by_pos = ev._load_part_masks(ref, 0)
    for key in by_name:
        np.testing.assert_array_equal(by_name[key], by_pos[key])
    with _pytest.raises(FileNotFoundError):
        ev._load_part_masks(
            ref, 0, sample_name=ref + "/UCB/train/input/9156/nope.npy")
