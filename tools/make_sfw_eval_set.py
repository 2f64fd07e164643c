"""Synthesize an SFW-format shadow-segmentation eval set with REAL labels.

The SFW dataset (the reference's shadow-segmentation benchmark,
train_with_TSM.py:619-707) is not shipped in the reference repo — only its
file contract is (<frame>.png / .npy / _label.png / _label_cmap.png,
dataset_with_TSM.py:225-296, label class 2 = shadow).  This tool builds an
evaluation set that honors the contract with MEANINGFUL labels: clean UCB
faces shadowed where the ground-truth spatially-varying shadow map is known
exactly and thresholded into the 3-class label map (2 shadow core,
1 penumbra, 0 background).

Two shadow families:

  * default (in-distribution): this framework's own occluder engine
    (data/synthesis.py — the same distribution the models train on).
    Pixel AUC against these labels measures in-distribution detection.

  * `--holdout`: a DISJOINT occluder family with shifted parameter ranges,
    so AUC on it is a held-out generalization number, not a circular one —
    the round-4 verdict's critique of the 0.944 figure.  Differences vs
    the training feed, all deliberate:
      - occluder shapes: parallel stripe patterns ("blinds") and random
        convex polygons (train: perlin-threshold blobs / library PNGs);
      - softening: box blur with kernels 21-31 px + a gamma warp of the
        soft mask (train: kernels 10-15, subsurface-scattering color or
        plain inversion);
      - intensity: one scalar in [0.15, 0.45] (train: spatial brightness
        FIELDS with min 0.3 / 0.5 — holdout shadows are darker and flat);
      - no SS color scattering (the holdout penumbra is achromatic).

`--frames N` writes N-frame clips with the occluder translating at a
per-clip velocity (temporally coherent, like the reference's real SFW
videos) — the input for the `sfw-video` CLI (train_test_GSC.py:893-932).

Usage:
  python tools/make_sfw_eval_set.py --out runs/sfw_eval [--images 20]
  python tools/make_sfw_eval_set.py --out runs/sfw_holdout --holdout
  python tools/make_sfw_eval_set.py --out runs/sfw_clips --holdout --frames 10
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

REF = "/root/reference"


def _holdout_occluder(rng: np.random.Generator, size: int) -> np.ndarray:
    """One canvas of the held-out occluder family: parallel stripes
    ('window blinds') or a random convex polygon — shapes the training
    engine (perlin-threshold blobs) never draws."""
    import cv2

    canvas = np.zeros((size, size), np.float32)
    if rng.uniform() < 0.5:
        period = int(rng.integers(24, 64))
        duty = rng.uniform(0.35, 0.65)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        ang = rng.uniform(0.0, np.pi)
        coord = xx * np.cos(ang) + yy * np.sin(ang)
        canvas = ((coord % period) < duty * period).astype(np.float32)
    else:
        # one random convex polygon covering a large face fraction
        k = int(rng.integers(4, 9))
        center = rng.uniform(0.3, 0.7, 2) * size
        radii = rng.uniform(0.2, 0.55, k) * size
        angs = np.sort(rng.uniform(0, 2 * np.pi, k))
        pts = np.stack([center[0] + radii * np.cos(angs),
                        center[1] + radii * np.sin(angs)], axis=1)
        hull = cv2.convexHull(pts.astype(np.int32))
        cv2.fillConvexPoly(canvas, hull, 1.0)
    return canvas


def _soften_holdout(rng: np.random.Generator, mask: np.ndarray) -> np.ndarray:
    """Held-out softening: large box blur + gamma warp (train: 10-15 px
    kernels, no gamma)."""
    import cv2

    k = int(rng.integers(21, 32))
    soft = cv2.blur(mask, (k, k))
    gamma = rng.uniform(0.7, 1.6)
    return np.clip(soft, 0.0, 1.0) ** gamma


def _holdout_clip_masks(rng: np.random.Generator, occ: np.ndarray,
                        frames: int) -> tuple:
    """Per-frame soft occluder masks for one held-out clip (pre-face-
    gating): the clip draws ONE velocity and ONE softening seed, then
    frame t is the occluder translated by (vel*t) and softened with the
    identical kernel/gamma — temporal coherence like the reference's real
    SFW videos (`dataset.py:808-867` frame schedules assume it).

    Returns (list of frames soft masks, vel)."""
    vel = rng.uniform(-8.0, 8.0, 2)
    soften_seed = int(rng.integers(0, 2 ** 31))  # fixed per clip
    masks = []
    for t in range(frames):
        srng = np.random.default_rng(soften_seed)
        dx, dy = (vel * t).astype(int)
        moved = np.roll(np.roll(occ, dy, axis=0), dx, axis=1)
        masks.append(_soften_holdout(srng, moved))
    return masks, vel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/sfw_eval")
    ap.add_argument("--images", type=int, default=20,
                    help="clips to write (one frame each unless --frames)")
    ap.add_argument("--frames", type=int, default=1,
                    help="frames per clip; >1 moves the occluder at a "
                         "per-clip velocity (sfw-video input)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--holdout", action="store_true",
                    help="draw shadows from the held-out family (disjoint "
                         "shapes, shifted blur/intensity ranges) instead "
                         "of the training engine's distribution")
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
        ShadowMaker, compose_shadow_image, shadow_synthesis_host)
    from blindshadowremoval_tpu.geometry.crop import face_crop_and_resize
    from blindshadowremoval_tpu.geometry.triangulation import (
        generate_face_region)
    from blindshadowremoval_tpu.ops.tonecurve import face_darken

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

        frames = []      # list of (shadowed, mask_sv[...,3]) per frame
        if not args.holdout and args.frames == 1:
            # original in-distribution single-frame path (docs/demo)
            gt, img_dark, mask, _, face = shadow_synthesis_host(
                crop, lm, 0.0, rng=rng)
            key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
            shadowed, mask_sv, _ = (np.asarray(a[0]) for a in
                                    compose_shadow_image(
                key, mask[None, ..., :1], gt[None], img_dark[None],
                face[None, ..., :1]))
            frames.append((shadowed, mask_sv))
        elif not args.holdout:
            # in-distribution CLIP: one ShadowMaker renders its moving
            # occluder at t=0..frames-1; ONE compositor key per clip keeps
            # the SS/brightness draws temporally coherent
            face = generate_face_region(lm, args.size)[..., :1]
            gt3, img_dark3, _ = (np.asarray(x) for x in face_darken(
                jax.random.PRNGKey(int(rng.integers(0, 2 ** 31))),
                np.asarray(crop, np.float32)))
            gt3 = np.clip(gt3, 0.0, 1.0)
            img_dark3 = np.clip(img_dark3, 0.0, 1.0)
            maker = ShadowMaker(face, lm, rng=rng)
            key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
            for t in range(args.frames):
                mask, _ = maker.compute_mask(float(t))
                shadowed, mask_sv, _ = (np.asarray(a[0]) for a in
                                        compose_shadow_image(
                    key, np.asarray(mask[None, ..., :1], np.float32),
                    gt3[None], img_dark3[None],
                    np.asarray(face[None], np.float32)))
                frames.append((shadowed, mask_sv))
        else:
            # ---- held-out family
            face1 = generate_face_region(lm, args.size)[..., 0]
            _, img_dark3, _ = (np.asarray(x) for x in face_darken(
                jax.random.PRNGKey(int(rng.integers(0, 2 ** 31))),
                np.asarray(crop, np.float32)))
            img_dark3 = np.clip(img_dark3, 0.0, 1.0)
            occ = _holdout_occluder(rng, args.size)
            intensity = rng.uniform(0.15, 0.45)
            clip_masks, _vel = _holdout_clip_masks(rng, occ, args.frames)
            for t in range(args.frames):
                soft = clip_masks[t]
                sv1 = soft * face1
                mask_sv = np.repeat(sv1[..., None], 3, axis=2)
                shadowed = (crop * (1.0 - mask_sv)
                            + img_dark3 * mask_sv * intensity)
                shadowed = np.clip(shadowed, 0.0, 1.0).astype(np.float32)
                frames.append((shadowed, mask_sv.astype(np.float32)))

        sv0 = frames[0][1].mean(axis=2)
        if (sv0 > args.shadow_core).mean() < 0.005:
            continue       # no real shadow landed on the face; resample

        vid = os.path.join(args.out, f"vid{count:03d}")
        os.makedirs(vid, exist_ok=True)
        for t, (shadowed, mask_sv) in enumerate(frames):
            sv = mask_sv.mean(axis=2)
            label = np.zeros(sv.shape, np.uint8)
            label[sv > args.penumbra] = 1
            label[sv > args.shadow_core] = 2
            img8 = cv2.cvtColor((shadowed * 255).astype(np.uint8),
                                cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(vid, f"{t}.png"), img8)
            # landmarks are already in crop space; the parser re-crops,
            # which is idempotent on an already-cropped frame with its lm
            np.save(os.path.join(vid, f"{t}.npy"), lm * args.size)
            cv2.imwrite(os.path.join(vid, f"{t}_label.png"), label)
            cv2.imwrite(os.path.join(vid, f"{t}_label_cmap.png"), img8)
        count += 1
        print(f"{vid}: {args.frames} frame(s), "
              f"shadow {(sv0 > args.shadow_core).mean():.3f}, penumbra "
              f"{((sv0 > args.penumbra) & (sv0 <= args.shadow_core)).mean():.3f}"
              + (" [holdout]" if args.holdout else ""))
    print(f"wrote {count} SFW-format clip(s) under {args.out}")


if __name__ == "__main__":
    main()
