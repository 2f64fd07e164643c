"""Host-side face crop/align (image I/O-adjacent preprocessing).

Re-implements the geometric contract of `face_crop_and_resize`
(utils.py:356-433) and the offline crop scripts (dataprocess.py:39-78).
These run on the host as part of data loading (decode -> crop -> resize);
everything after (map generation, augmentation, model) is on-device.

Box convention (utils.py:387-400): a square window of side 2L centered on the
landmark extent, shifted up by 0.2L, where L = 1.4 x half the larger landmark
extent.  Landmarks are returned normalized by the box side (2L).
"""

from __future__ import annotations

import numpy as np

from blindshadowremoval_tpu.geometry.landmarks import mirror_landmarks


def _resize_bilinear_np(img: np.ndarray, size: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    except Exception:  # pragma: no cover - cv2 is available in this image
        import jax

        return np.asarray(
            jax.image.resize(img, (size, size) + img.shape[2:], "linear")
        )


def pts_load(path: str) -> np.ndarray:
    """Load a `.pts` landmark annotation file (utils.py:340-354): points
    listed between '{' and '}' lines, one x y pair per line."""
    with open(path) as fh:
        rows = [r.strip() for r in fh]
    head = rows.index("{") + 1
    tail = rows.index("}")
    pts = [tuple(float(v) for v in line.split()) for line in rows[head:tail]]
    return np.asarray(pts, dtype=np.float32)


def rotate_center(img: np.ndarray, deg: float) -> np.ndarray:
    """Rotate CCW by `deg` about the image center, output size unchanged.

    Drop-in for the reference's `ndimage.rotate(img, deg, reshape=False)`
    (utils.py:381,968) as a cv2 affine warp: same direction and the same
    (n-1)/2 center (verified against ndimage), but bilinear interpolation
    instead of scipy's cubic spline — scipy's generic geometric_transform
    costs ~22 ms/sample in prefiltering on augmentation-only paths where the
    interpolation order is distributionally irrelevant (PARITY.md).
    """
    import cv2

    rows, cols = img.shape[:2]
    rotm = cv2.getRotationMatrix2D(((cols - 1) / 2.0, (rows - 1) / 2.0),
                                   deg, 1.0)
    out = cv2.warpAffine(np.ascontiguousarray(img), rotm, (cols, rows),
                         flags=cv2.INTER_LINEAR)
    if out.ndim == 2 and img.ndim == 3:
        out = out[..., None]
    return out


def rotate_image_and_landmarks(img: np.ndarray, lm: np.ndarray, deg: float):
    """Rotate image CCW by `deg` about its center, with matching landmarks.

    Matches utils.py:370-382 (scipy.ndimage.rotate with reshape=False; the
    lm transform keeps the reference's n/2 landmark center, a half-pixel
    quirk the reference itself carries).
    """
    rows, cols = img.shape[:2]
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    x = lm[:, 0] - cols / 2
    y = lm[:, 1] - rows / 2
    out = np.array(lm, copy=True)   # keep float dtype (see face_crop_and_resize)
    if not np.issubdtype(out.dtype, np.floating):
        out = out.astype(np.float32)
    out[:, 0] = y * s + x * c + cols / 2
    out[:, 1] = y * c - x * s + rows / 2
    return rotate_center(img, deg), out


def face_crop_and_resize(
    img: np.ndarray,
    lm: np.ndarray,
    fsize: int,
    aug: bool = False,
    rng: np.random.Generator | None = None,
):
    """Crop the face box, resize to `fsize`, normalize landmarks.

    Returns (img, lm_norm, lm_mirror_norm, box) exactly like the reference
    (utils.py:356-433): `box` is the crop window in *original* image
    coordinates (pre-padding), landmarks are divided by the box side.
    """
    img = np.asarray(img)
    # keep the caller's FLOAT landmark dtype (float32 for the shipped .npy
    # contract), matching utils.py:358 `np.copy(lm0)`: the box corners go
    # through int() truncation, so f32-vs-f64 rounding of the center/length
    # (e.g. 128.0f vs 127.99999809) shifts the crop window by a full pixel.
    # Integer landmarks (lists, annotation-tool exports) must promote, or
    # the rotated coordinates below would truncate per-landmark.
    lm = np.array(lm, copy=True)
    if not np.issubdtype(lm.dtype, np.floating):
        lm = lm.astype(np.float32)
    rows, cols = img.shape[:2]

    if aug:
        if rng is None:
            rng = np.random.default_rng()
        if rng.uniform() > 0.5:
            deg = rng.uniform(-10, 10)
            img, lm = rotate_image_and_landmarks(img, lm, deg)

    lm_mirror = mirror_landmarks(lm, cols)

    cx = (lm[:, 0].min() + lm[:, 0].max()) / 2
    cy = (lm[:, 1].min() + lm[:, 1].max()) / 2
    length = max((lm[:, 0].max() - lm[:, 0].min()) / 2,
                 (lm[:, 1].max() - lm[:, 1].min()) / 2) * 1.4
    if aug:
        cx += rng.uniform(-0.1, 0.1) * length
        cy += rng.uniform(-0.1, 0.1) * length
        length *= rng.uniform(0.9, 1.1)

    box = [int(cx) - int(length), int(cy) - int(length * 1.2),
           int(cx) + int(length),
           int(cy) + int(length) + int(length) - int(length * 1.2)]
    box0 = list(box)
    box_m = [cols - box[2], box[1], cols - box[0], box[3]]

    lm[:, 0] -= box[0]
    lm[:, 1] -= box[1]
    lm_mirror[:, 0] -= box_m[0]
    lm_mirror[:, 1] -= box_m[1]

    # native fused crop+zero-pad+bilinear-resize (native/loader.cc) replaces
    # the reference's allocate-padded-canvas -> slice -> cv2.resize sequence
    # (utils.py:414-431); sampling is identical (half-pixel bilinear over a
    # zero-padded plane)
    if (box[3] - box[1]) == (box[2] - box[0]) and (box[3] - box[1]) > 0:
        from blindshadowremoval_tpu.utils.native import crop_resize

        img = crop_resize(img.astype(np.float32),
                          (box[0], box[1], box[2], box[3]), fsize)
    else:
        img = np.zeros((fsize, fsize, img.shape[2]), np.float32)

    # degenerate landmark sets (zero extent) would divide by zero in the
    # reference (utils.py:433); guard so landmarks stay finite
    side = max(length * 2, 1e-6)
    return (img.astype(np.float32), (lm / side).astype(np.float32),
            (lm_mirror / side).astype(np.float32),
            np.asarray(box0, np.float32))


def offline_crop(img: np.ndarray, lm: np.ndarray, out_size: int = 256,
                 min_face: int = 250):
    """Offline dataset-prep crop (dataprocess.py:39-78).

    A 1.45x landmark-extent square, center shifted up by 1.2x, zero-padded if
    out of bounds; faces smaller than `min_face` px are rejected (returns
    None).  Returns (cropped_resized_img, rescaled_landmarks).
    """
    img = np.asarray(img)
    lm = np.array(lm, dtype=np.float64, copy=True)
    rows, cols = img.shape[:2]

    cx = (lm[:, 0].min() + lm[:, 0].max()) / 2
    cy = (lm[:, 1].min() + lm[:, 1].max()) / 2
    length = max((lm[:, 0].max() - lm[:, 0].min()) / 2,
                 (lm[:, 1].max() - lm[:, 1].min()) / 2) * 1.45
    box = [int(cx) - int(length), int(cy) - int(length * 1.2),
           int(cx) + int(length),
           int(cy) + int(length) + int(length) - int(length * 1.2)]

    lm[:, 0] -= box[0]
    lm[:, 1] -= box[1]

    pad_x = max(-box[0], box[2] - cols) if (box[0] < 0 or box[2] > cols) else 0
    pad_y = max(-box[1], box[3] - rows) if (box[1] < 0 or box[3] > rows) else 0
    if pad_x > 0 or pad_y > 0:
        big = np.zeros((rows + 2 * pad_y + 2, cols + 2 * pad_x + 2, img.shape[2]),
                       dtype=img.dtype)
        big[pad_y:pad_y + rows, pad_x:pad_x + cols, :] = img
        img = big
        box = [box[0] + pad_x, box[1] + pad_y, box[2] + pad_x, box[3] + pad_y]

    crop = img[box[1]:box[3], box[0]:box[2], :]
    side = crop.shape[0]
    if side <= min_face or crop.shape[0] != crop.shape[1]:
        return None
    out = _resize_bilinear_np(crop.astype(np.float32), out_size)
    lm = lm * (out_size / side)
    return out, lm.astype(np.float32)
