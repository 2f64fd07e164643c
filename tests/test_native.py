"""Native C++ loader kernels vs numpy/cv2 oracles."""

import numpy as np
import pytest

from blindshadowremoval_tpu.utils import native


def test_library_builds():
    lib = native.get_lib()
    assert lib is not None, "native loader failed to build (g++ missing?)"


def test_crop_resize_matches_cv2_interior(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(size=(100, 120, 3)).astype(np.float32)
    box = (10, 20, 90, 100)   # fully inside
    ours = native.crop_resize(img, box, 64)
    ref = cv2.resize(img[20:100, 10:90], (64, 64),
                     interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_crop_resize_zero_pads_outside(rng):
    img = rng.uniform(0.5, 1.0, size=(50, 50, 3)).astype(np.float32)
    out = native.crop_resize(img, (-50, -50, 0, 0), 32)  # fully outside
    np.testing.assert_allclose(out, 0.0, atol=1e-7)
    out2 = native.crop_resize(img, (-25, 0, 25, 50), 50)  # half outside
    assert np.allclose(out2[:, :24], 0.0, atol=1e-6)
    assert out2[:, 30:].min() > 0.4


def test_native_matches_numpy_fallback(rng):
    img = rng.uniform(size=(64, 80, 4)).astype(np.float32)
    box = (-10, 5, 70, 85)
    ours = native.crop_resize(img, box, 48)
    ref = native._crop_resize_np(img, box, 48)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_batch_crop_resize(rng):
    imgs = rng.uniform(size=(6, 40, 40, 3)).astype(np.float32)
    boxes = np.array([[0, 0, 40, 40]] * 6, np.int32)
    boxes[3] = [10, 10, 30, 30]
    out = native.batch_crop_resize(imgs, boxes, 32)
    assert out.shape == (6, 32, 32, 3)
    single = native.crop_resize(imgs[3], boxes[3], 32)
    np.testing.assert_allclose(out[3], single, atol=1e-6)


def test_hflip(rng):
    img = rng.uniform(size=(8, 9, 3)).astype(np.float32)
    np.testing.assert_allclose(native.hflip(img), img[:, ::-1], atol=0)
