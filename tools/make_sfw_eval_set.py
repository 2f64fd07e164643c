"""Synthesize an SFW-format shadow-segmentation eval set with REAL labels.

The SFW dataset (the reference's shadow-segmentation benchmark,
train_with_TSM.py:619-707) is not shipped in the reference repo — only its
file contract is (<frame>.png / .npy / _label.png / _label_cmap.png,
dataset_with_TSM.py:225-296, label class 2 = shadow).  This tool builds an
evaluation set that honors the contract with MEANINGFUL labels: clean UCB
faces with shadows synthesized by this framework's own occluder engine
(data/synthesis.py — the same distribution the models train on), where the
ground-truth spatially-varying shadow map is known exactly and thresholded
into the 3-class label map (2 shadow core, 1 penumbra, 0 background).

Pixel AUC of a model's predicted shadow map against these labels is then a
real quality signal for the demo trajectory (docs/demo/README.md), not a
fixture-rectangle exercise like tests/goldens/tf_ref/sfw_synth.

Usage:
  python tools/make_sfw_eval_set.py --out runs/sfw_eval [--images 20]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/sfw_eval")
    ap.add_argument("--images", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--shadow-core", type=float, default=0.5,
                    help="mask_sv level above which a pixel is label 2")
    ap.add_argument("--penumbra", type=float, default=0.05,
                    help="mask_sv level above which a pixel is label 1")
    args = ap.parse_args()

    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jeb

    _jeb.clear_backends()

    from blindshadowremoval_tpu.data.synthesis import (
        compose_shadow_image, shadow_synthesis_host)
    from blindshadowremoval_tpu.geometry.crop import face_crop_and_resize

    rng = np.random.default_rng(args.seed)
    ids = sorted(glob.glob(os.path.join(REF, "UCB", "train", "gt", "*")))
    count = 0
    for ident in ids:
        if count >= args.images:
            break
        lms = sorted(glob.glob(ident + "/*.npy"))
        if not lms:
            continue
        lm_path = lms[int(rng.integers(0, len(lms)))]
        img = cv2.cvtColor(cv2.imread(lm_path.rsplit(".", 1)[0] + ".png"),
                           cv2.COLOR_BGR2RGB) / 255.0
        crop, lm, _, _ = face_crop_and_resize(img, np.load(lm_path),
                                              args.size)
        gt, img_dark, mask, _, face = shadow_synthesis_host(
            crop, lm, 0.0, rng=rng)
        # the in-graph compositor gives the final shadowed frame and its
        # exact spatially-varying shadow map (data/synthesis.py)
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        shadowed, mask_sv, _ = (np.asarray(a[0]) for a in
                                compose_shadow_image(
            key, mask[None, ..., :1], gt[None], img_dark[None],
            face[None, ..., :1]))
        sv = mask_sv.mean(axis=2)
        label = np.zeros(sv.shape, np.uint8)
        label[sv > args.penumbra] = 1
        label[sv > args.shadow_core] = 2
        if (label == 2).mean() < 0.005:   # no real shadow landed on the
            continue                      # face; resample another identity

        vid = os.path.join(args.out, f"vid{count:03d}")
        os.makedirs(vid, exist_ok=True)
        cv2.imwrite(os.path.join(vid, "0.png"),
                    cv2.cvtColor((shadowed * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        # landmarks are already in crop space; the parser re-crops, which
        # is idempotent on an already-cropped frame with its own lm
        np.save(os.path.join(vid, "0.npy"), lm * args.size)
        cv2.imwrite(os.path.join(vid, "0_label.png"), label)
        cv2.imwrite(os.path.join(vid, "0_label_cmap.png"),
                    cv2.cvtColor((shadowed * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        count += 1
        print(f"{vid}: shadow {(label == 2).mean():.3f}, "
              f"penumbra {(label == 1).mean():.3f}")
    print(f"wrote {count} SFW-format frames under {args.out}")


if __name__ == "__main__":
    main()
