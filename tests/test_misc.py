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
