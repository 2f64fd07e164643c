"""Anti-aliased landmark skeleton map.

Re-implementation of `generate_landmark_map` (utils.py:296-322): draw the
68-point facial skeleton (jaw, brows, eyes, nose, lips) as anti-aliased
segments, Gaussian-blur, and max-normalize to [0, 255].  The reference uses
`skimage.draw.line_aa`; this image has no skimage, so segments are rendered
with Wu's anti-aliased line algorithm in numpy (the same coverage model
line_aa implements).
"""

from __future__ import annotations

import numpy as np

from blindshadowremoval_tpu.geometry.landmarks import LM_SKELETON_EDGES


def _draw_line_aa(img: np.ndarray, x0: float, y0: float, x1: float,
                  y1: float) -> None:
    """Wu's anti-aliased line into img[y, x] (values max-combined)."""
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
    if x0 > x1:
        x0, x1 = x1, x0
        y0, y1 = y1, y0
    dx = x1 - x0
    dy = y1 - y0
    grad = dy / dx if dx != 0 else 1.0

    h, w = img.shape
    xs = np.arange(int(round(x0)), int(round(x1)) + 1)
    ys = y0 + grad * (xs - x0)
    ylo = np.floor(ys).astype(int)
    frac = ys - ylo
    for xi, yi, f in zip(xs, ylo, frac):
        r0, c0 = (xi, yi) if steep else (yi, xi)
        r1, c1 = (xi, yi + 1) if steep else (yi + 1, xi)
        if 0 <= r0 < h and 0 <= c0 < w:
            img[r0, c0] = max(img[r0, c0], 1.0 - f)
        if 0 <= r1 < h and 0 <= c1 < w:
            img[r1, c1] = max(img[r1, c1], f)


def generate_landmark_map(landmarks: np.ndarray, img_size: int) -> np.ndarray:
    """Landmarks (68, 2) normalized -> (img_size, img_size, 1) uint8-scale map.

    Matches the reference contract: segments of LM_SKELETON_EDGES drawn at
    landmark positions * img_size, 3x3 Gaussian blur, normalized so the max
    is 255 (utils.py:303-322).
    """
    lm = np.asarray(landmarks, np.float64) * img_size
    canvas = np.zeros((img_size, img_size), np.float32)
    for a, b in LM_SKELETON_EDGES:
        # reference indexes img[cc, rr]: landmark x -> column, y -> row
        _draw_line_aa(canvas, lm[a, 0], lm[a, 1], lm[b, 0], lm[b, 1])

    # 3x3 Gaussian blur (cv2 sigma-from-ksize: 0.8)
    k = np.array([np.exp(-0.5 * (i / 0.8) ** 2) for i in (-1, 0, 1)])
    k /= k.sum()
    blurred = np.apply_along_axis(
        lambda r: np.convolve(np.pad(r, 1, mode="edge"), k, "valid"), 0, canvas)
    blurred = np.apply_along_axis(
        lambda r: np.convolve(np.pad(r, 1, mode="edge"), k, "valid"), 1, blurred)
    peak = blurred.max()
    if peak > 0:
        blurred = blurred / peak * 255.0
    return blurred.reshape(img_size, img_size, 1)
