"""End-to-end pipeline (eval/e2e.py): the batched raw-image -> deshadowed
path that replaces the reference's three manual scripts
(bmvc2022-dataprocess.py + dataprocess.py + train_test_GSC.py main).

Equivalence strategy: each batched stage is checked against its per-image
twin (FaceDetector vs detect_faces on the letterboxed frame; LandmarkAligner
vs landmarks_from_image), and the whole pipeline with oracle landmarks is
checked against the manual offline_crop + ShadowRemovalService composition.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

SAMPLE = "/root/reference/sample_uncropped_images"


# ------------------------------------------------------------ detector

def _sfd_vars(det_size):
    from blindshadowremoval_tpu.models.sfd import S3FD

    m = S3FD()
    return m.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, det_size, det_size, 3)))


def test_letterbox_geometry():
    from blindshadowremoval_tpu.models.sfd import letterbox

    img = np.full((60, 120, 3), 200, np.uint8)
    canvas, scale = letterbox(img, 128)
    assert canvas.shape == (128, 128, 3)
    assert scale == 128 / 120
    # content occupies the top-left (60*scale)x128 region; rest is zero
    nh = round(60 * scale)
    assert canvas[:nh, :, :].mean() > 150
    assert canvas[nh + 1:, :, :].max() == 0.0


@pytest.mark.slow   # compiles the VGG16 trunk at two shapes
def test_face_detector_matches_per_image_path():
    """Batched canonical-size detection == per-image detect_faces on the
    letterboxed frame, with boxes rescaled to original coordinates —
    mixed input sizes through ONE compiled executable."""
    from blindshadowremoval_tpu.models import sfd

    det_size = 128
    variables = _sfd_vars(det_size)
    rng = np.random.default_rng(3)
    images = [rng.uniform(0, 255, (100, 80, 3)).astype(np.uint8),
              rng.uniform(0, 255, (50, 120, 3)).astype(np.uint8),
              rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8)]

    # topk >= every head's full position count at det_size 128 (stride-4
    # head: 32x32=1024): the device top-k then covers the dense grid and
    # the batched path must match the dense per-image decode EXACTLY even
    # though random-init weights put the whole grid above the 0.05 floor
    det = sfd.FaceDetector(variables, det_size=det_size, batch_size=2,
                           filter_threshold=0.0, topk=1024)
    batched = det(images)
    assert len(batched) == 3

    for img, got in zip(images, batched):
        canvas, scale = sfd.letterbox(img, det_size)
        want = sfd.detect_faces(variables, canvas, filter_threshold=0.0)
        want = want.copy()
        want[:, :4] /= scale
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


# ------------------------------------------------------------- aligner

@pytest.mark.slow   # compiles the hourglass batched + per-image
def test_landmark_aligner_matches_per_image_path():
    from blindshadowremoval_tpu.models import fan

    m = fan.FAN(num_modules=1)
    variables = m.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, fan.INPUT_RES, fan.INPUT_RES, 3)))
    rng = np.random.default_rng(4)
    images = [rng.uniform(0, 255, (300, 400, 3)).astype(np.uint8),
              rng.uniform(0, 255, (500, 280, 3)).astype(np.uint8),
              rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8)]
    boxes = [(80, 40, 320, 280), (30, 100, 250, 420), (0, 0, 256, 256)]

    al = fan.LandmarkAligner(variables, num_modules=1, batch_size=2)
    got = al(images, boxes)
    assert len(got) == 3
    for img, box, g in zip(images, boxes, got):
        want = fan.landmarks_from_image(variables, img, box=box,
                                        num_modules=1)
        # identical crops through the identical network; the only delta is
        # the host-numpy vs jnp coordinate affine
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_landmark_aligner_u8_ingress_exact_on_integer_crops():
    """ingress_u8 ships crops as uint8 fixed-point dequantized in-graph.
    When the crop is integer-valued (box aligned to the input so the
    resample is the identity) the round trip is lossless and the decoded
    landmarks must equal the f32 path bit-for-bit — certifying the
    quantize/dequantize plumbing.  (On interpolated crops the 1/255 step
    can move the sub-pixel decode nudge; a random network's near-flat
    heatmaps amplify that arbitrarily, so closeness there is untestable —
    the f32 default remains the exact-contract path.)"""
    from blindshadowremoval_tpu.models import fan

    m = fan.FAN(num_modules=1)
    variables = m.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, fan.INPUT_RES, fan.INPUT_RES, 3)))
    rng = np.random.default_rng(6)
    a32 = fan.LandmarkAligner(variables, num_modules=1, batch_size=1,
                              warm=False)
    au8 = fan.LandmarkAligner(variables, num_modules=1, batch_size=1,
                              ingress_u8=True, warm=False)
    crops_u8 = rng.integers(0, 256, (1, fan.INPUT_RES, fan.INPUT_RES, 3),
                            dtype=np.uint8)
    p32 = np.asarray(a32._apply(variables,
                                jnp.asarray(crops_u8, jnp.float32) / 255.0))
    pu8 = np.asarray(au8._apply(variables, jnp.asarray(crops_u8)))
    np.testing.assert_array_equal(p32, pu8)


# ------------------------------------------------------------ pipeline

def _gen_setup(tmp_path):
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.train.trainer import build_generator

    cfg = get_config("in_the_wild", img_size=256, device_geometry=True,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    gen = build_generator(cfg)
    z3 = np.zeros((1, 256, 256, 3), np.float32)
    variables = gen.init(jax.random.PRNGKey(0), z3, z3, None)
    return cfg, variables


@pytest.mark.slow   # builds the 256^2 serving engine
@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_pipeline_oracle_landmarks_matches_manual_path(tmp_path):
    """With caller-provided landmarks (the reference's shipped .npy
    contract) the pipeline must equal offline_crop + ShadowRemovalService
    composed by hand."""
    import cv2

    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline
    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.geometry.crop import offline_crop

    cfg, variables = _gen_setup(tmp_path)
    img = cv2.cvtColor(cv2.imread(os.path.join(SAMPLE, "01001.png")),
                       cv2.COLOR_BGR2RGB)
    lm = np.load(os.path.join(SAMPLE, "01001.npy"))

    pipe = DeshadowPipeline(cfg, variables, batch_size=2)
    res = pipe([img], landmarks=[lm])
    assert res[0] is not None
    assert pipe.last_times.faces == 1

    crop, lm2 = offline_crop(img, lm, out_size=256)
    svc = ShadowRemovalService(cfg, variables, batch_size=2)
    want = svc.remove_shadows([crop / 255.0], [lm2])[0]
    np.testing.assert_allclose(res[0]["pred"], want["pred"], atol=1e-5)
    np.testing.assert_allclose(res[0]["mask_pred"], want["mask_pred"],
                               atol=1e-5)
    # the composite gates pred by the clipped face-gated shadow map
    m = np.clip(want["mask_pred"], 0, 1)
    np.testing.assert_allclose(
        res[0]["out"],
        np.clip(want["pred"] * m + want["img"] * (1 - m), 0, 1), atol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="sample fixture absent")
def test_pipeline_run_dir_writes_outputs(tmp_path):
    """run_dir: .npy-landmarked PNGs flow through and write the three
    output images; timing stats aggregate."""
    import cv2
    import shutil

    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline

    cfg, variables = _gen_setup(tmp_path)
    indir = tmp_path / "in"
    indir.mkdir()
    for name in ("01001", "01002"):
        shutil.copy(os.path.join(SAMPLE, name + ".png"), indir)
        shutil.copy(os.path.join(SAMPLE, name + ".npy"), indir)

    pipe = DeshadowPipeline(cfg, variables, batch_size=2)
    # batch_files=1 -> two chunks, so the overlapped stage pipeline
    # actually streams (read/detect/align/crop/deshadow on different
    # chunks concurrently)
    stats = pipe.run_dir(str(indir), str(tmp_path / "out"), batch_files=1)
    assert stats["written"] == 2
    assert stats["faces"] == 2 and stats["images"] == 2
    assert stats["wall"] > 0
    for name in ("01001", "01002"):
        for sfx in ("out", "pred", "mask"):
            p = tmp_path / "out" / f"{name}-{sfx}.png"
            assert p.is_file()
            assert cv2.imread(str(p)).shape == (256, 256, 3)

    # the serial path must write byte-identical outputs (the overlapped
    # pipeline reorders WORK, never data)
    stats2 = pipe.run_dir(str(indir), str(tmp_path / "out2"), batch_files=1,
                          overlap=False)
    assert stats2["written"] == 2
    for name in ("01001", "01002"):
        for sfx in ("out", "pred", "mask"):
            a = cv2.imread(str(tmp_path / "out" / f"{name}-{sfx}.png"))
            b = cv2.imread(str(tmp_path / "out2" / f"{name}-{sfx}.png"))
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_pipeline_no_face_and_small_face_yield_none(tmp_path):
    """Detector finding nothing, or a face below the min_face gate
    (dataprocess.py:66), must yield None for that image while others
    proceed."""
    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline

    cfg, variables = _gen_setup(tmp_path)
    pipe = DeshadowPipeline(cfg, variables, batch_size=2)
    rng = np.random.default_rng(5)
    big = rng.uniform(0, 255, (900, 900, 3)).astype(np.uint8)
    small = rng.uniform(0, 255, (300, 300, 3)).astype(np.uint8)
    # landmarks spanning ~600 px pass the 250 px gate; ~80 px ones fail
    lm_big = rng.uniform(150, 750, (68, 2)).astype(np.float32)
    lm_small = rng.uniform(100, 180, (68, 2)).astype(np.float32)
    res = pipe([big, small], landmarks=[lm_big, lm_small])
    assert res[0] is not None and res[1] is None
    assert pipe.last_times.faces == 1

    # no detector, no landmarks -> loud error, not silent skip
    with pytest.raises(ValueError, match="sfd_variables"):
        pipe([big])


# ---------------------------------------------------------------- run_dir
# threading/error machinery, stage-stubbed (fast tier: nothing compiles)

def _stub_pipeline(monkeypatch=None, align_raises=False):
    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline

    pipe = object.__new__(DeshadowPipeline)
    pipe._stage_detect = lambda imgs, lms, bxs: (bxs, 0.01)

    def _align(imgs, lms, bxs):
        if align_raises:
            raise ValueError("align boom")
        return lms, 0.01

    pipe._stage_align = _align
    pipe._stage_crop = lambda imgs, lms: (
        [np.zeros((8, 8, 3), np.float32) for _ in imgs], 0.01)
    pipe._stage_deshadow = lambda crops, bxs: (
        [{"out": c, "pred": c, "mask_pred": c[..., :1]} for c in crops],
        0.01, len(crops))
    return pipe


def _write_pngs(d, n=3):
    import cv2

    d.mkdir(exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(d / f"im{i}.png"), np.zeros((8, 8, 3), np.uint8))


def test_run_dir_stats_shape_matches_across_overlap(tmp_path):
    """Serial and overlapped run_dir return the same stat keys (incl.
    images_per_s_wall), so an A/B caller never KeyErrors on the mode."""
    _write_pngs(tmp_path / "in")
    for overlap, out in ((True, "o1"), (False, "o2")):
        stats = _stub_pipeline().run_dir(str(tmp_path / "in"),
                                         str(tmp_path / out),
                                         batch_files=2, overlap=overlap)
        assert stats["written"] == 3 and stats["images"] == 3
        assert stats["images_per_s_wall"] > 0


def test_run_dir_overlap_stage_error_propagates_fast(tmp_path):
    """A stage exception in the overlapped pipeline reaches the caller
    promptly (cooperative shutdown: no 30 s join stalls, no deadlock)."""
    import time as _time

    import pytest

    _write_pngs(tmp_path / "in")
    t0 = _time.perf_counter()
    with pytest.raises(ValueError, match="align boom"):
        _stub_pipeline(align_raises=True).run_dir(
            str(tmp_path / "in"), str(tmp_path / "out"), batch_files=1)
    assert _time.perf_counter() - t0 < 15.0


def test_run_dir_overlap_writer_error_propagates(tmp_path, monkeypatch):
    """A write failure in the overlapped pipeline's writer thread must
    surface as an exception, not hang the producer or return success."""
    import cv2

    import pytest

    _write_pngs(tmp_path / "in")

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(cv2, "imwrite", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        _stub_pipeline().run_dir(str(tmp_path / "in"),
                                 str(tmp_path / "out"), batch_files=1)
