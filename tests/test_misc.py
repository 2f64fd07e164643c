"""Landmark skeleton map, profiling utilities, config presets, CLI parser."""

import numpy as np

from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.geometry.landmark_map import generate_landmark_map
from blindshadowremoval_tpu.geometry.landmarks import LM_REF
from blindshadowremoval_tpu.utils.profiling import StepTimer


def test_landmark_map_draws_skeleton():
    m = generate_landmark_map(LM_REF, 128)
    assert m.shape == (128, 128, 1)
    assert m.max() == 255.0
    # skeleton covers a small fraction of the image
    frac = (m > 10).mean()
    assert 0.005 < frac < 0.2
    # jawline midpoint lands on a drawn pixel
    jaw = (LM_REF[8] * 128).astype(int)
    assert m[jaw[1], jaw[0], 0] > 0


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.stats(items_per_step=4)
    assert s["items_per_sec"] > 0
    assert s["p95_ms"] >= 0


def test_config_presets():
    cfg = get_config("sfw")
    assert cfg.variant == "tsm"
    assert cfg.num_views == 10
    cfg2 = get_config("train", batch_size=4)
    assert cfg2.batch_size == 4
    assert cfg2.num_views == 2


def test_cli_parser_covers_all_modes():
    from blindshadowremoval_tpu.cli import build_parser

    ap = build_parser()
    for argv in (
        ["infer", "--data", "x/*"],
        ["ucb", "--data", "x/*", "--part-masks", "."],
        ["sfw", "--data", "x/*"],
        ["sfw-video", "--data", "x/*"],
        ["train", "--data", "x/*"],
        ["preprocess", "--input", "a", "--output", "b"],
        ["landmarks", "--input", "a"],
    ):
        args = ap.parse_args(argv)
        assert args.cmd == argv[0]


def test_pts_load(tmp_path):
    from blindshadowremoval_tpu.geometry.crop import pts_load

    p = tmp_path / "a.pts"
    p.write_text("version: 1\nn_points: 3\n{\n1.5 2.5\n3 4\n5.5 6\n}\n")
    pts = pts_load(str(p))
    np.testing.assert_allclose(pts, [[1.5, 2.5], [3, 4], [5.5, 6]])


def test_prefetch_preserves_order_and_propagates_errors():
    from blindshadowremoval_tpu.data.dataset import prefetch

    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))
    assert list(prefetch(iter([]))) == []

    def boom():
        yield 1
        raise ValueError("parser died")

    it = prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="parser died"):
        list(it)

def test_prefetch_abandoned_consumer_stops_producer():
    """Breaking out of (or closing) a prefetch generator must terminate the
    producer thread rather than leaving it blocked in q.put forever."""
    import threading
    import time

    from blindshadowremoval_tpu.data.dataset import prefetch

    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(src(), depth=2)
    assert next(it) == 0
    it.close()   # consumer abandons early (same path as a raised exception)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 1000, "producer ran to completion after close"


def test_crop_promotes_integer_landmarks():
    """Integer landmark inputs must promote to float before the rotation
    writes float coordinates back (truncation would shift points ~1px)."""
    from blindshadowremoval_tpu.geometry.crop import (
        face_crop_and_resize,
        rotate_image_and_landmarks,
    )

    img = np.zeros((300, 300, 3), np.float32)
    lm_f = np.linspace(40, 260, 136, dtype=np.float32).reshape(68, 2)
    lm_i = np.round(lm_f).astype(np.int64)

    _, out_i = rotate_image_and_landmarks(img, lm_i, 7.3)
    _, out_f = rotate_image_and_landmarks(img, lm_i.astype(np.float64), 7.3)
    assert np.issubdtype(out_i.dtype, np.floating)
    np.testing.assert_allclose(out_i, out_f, atol=1e-4)

    crop_i, lmn_i, _, box_i = face_crop_and_resize(img, lm_i, 256)
    crop_f, lmn_f, _, box_f = face_crop_and_resize(
        img, lm_i.astype(np.float32), 256)
    assert np.array_equal(box_i, box_f)
    np.testing.assert_allclose(lmn_i, lmn_f, atol=1e-6)


def test_ucb_part_masks_missing_raises(tmp_path):
    """A mask present in face_hair but absent from another part dir must
    raise FileNotFoundError, not crash on None arithmetic."""
    import cv2
    import pytest

    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    root = tmp_path
    fname = "vid_0001-result.png"
    for d in UCBEvaluator.PART_DIRS.values():
        (root / d).mkdir()
    # write the mask ONLY into face_hair
    cv2.imwrite(str(root / UCBEvaluator.PART_DIRS["face_hair"] / fname),
                np.zeros((8, 8, 3), np.uint8))
    ev = object.__new__(UCBEvaluator)   # _load_part_masks needs no state
    with pytest.raises(FileNotFoundError, match=fname):
        ev._load_part_masks(str(root), 0)
    with pytest.raises(FileNotFoundError, match=fname):
        ev._load_part_masks(str(root), 0, sample_name="vid/0001.npy")


def test_lr_decay_schedule():
    """config.lr_decay_factor builds a staircase Adam LR: constant within an
    epoch window, scaled by the factor at each transition (the schedule the
    reference declares but never wires, train_test_GSC.py:41,48,162-164)."""
    import jax.numpy as jnp
    import optax

    from blindshadowremoval_tpu.train.trainer import Trainer

    cfg = get_config("train", steps_per_epoch=2, lr_decay_factor=0.5,
                     lr_decay_epochs=1.0)
    tx = Trainer(cfg).gen_tx
    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    # Adam with constant grads updates by ~lr (mhat/sqrt(vhat) == 1)
    steps = []
    for _ in range(4):
        upd, opt_state = tx.update(grads, opt_state, params)
        steps.append(float(jnp.abs(upd["w"]).mean()))
    lr = cfg.learning_rate
    np.testing.assert_allclose(steps[0], lr, rtol=1e-3)
    np.testing.assert_allclose(steps[1], lr, rtol=1e-3)        # same window
    np.testing.assert_allclose(steps[2], lr * 0.5, rtol=1e-3)  # 1 transition
    np.testing.assert_allclose(steps[3], lr * 0.5, rtol=1e-3)

    # default config stays the constant-LR, schedule-free optimizer
    cfg0 = get_config("train")
    tx0 = Trainer.shared(cfg0).gen_tx
    s0 = tx0.init(params)
    upd0, _ = tx0.update(grads, s0, params)
    np.testing.assert_allclose(float(jnp.abs(upd0["w"]).mean()),
                               cfg0.learning_rate, rtol=1e-3)
