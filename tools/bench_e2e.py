"""End-to-end throughput of the raw-image -> deshadowed pipeline.

Measures the warm DeshadowPipeline (eval/e2e.py) on the TPU — the
single-pass replacement for the reference's three manual scripts
(bmvc2022-dataprocess.py + dataprocess.py + train_test_GSC.py main):

  * detect stage: batched S3FD at the canonical letterbox size, including
    the host letterbox/decode/NMS work (models/sfd.py:FaceDetector);
  * align+crop+deshadow: FAN landmarks -> offline_crop -> serving engine,
    driven through DeshadowPipeline.__call__ with caller boxes (the
    detector's product), so every downstream stage runs end-to-end;
  * the composed raw-image rate: detect + (align+crop+deshadow) per-image
    costs summed — the stages share the host thread, so the serial sum is
    the honest single-process number (stage overlap across requests is a
    deployment-level pipeline concern).

Weights are random-init (the published SFD/FAN checkpoints are external
downloads; throughput is shape-determined) with the detector's candidate
floor raised so the host NMS sees a realistic (few-candidate) load —
real images under real weights produce a handful of candidates, while
random logits at the 0.05 floor would drown the bench in NMS work no real
frame produces.

Usage: python tools/bench_e2e.py [--images 64] [--size 720 1280]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np



def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--det-batch", type=int, default=8)
    ap.add_argument("--fan-batch", type=int, default=32)
    ap.add_argument("--serve-batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline
    from blindshadowremoval_tpu.models.fan import FAN, INPUT_RES
    from blindshadowremoval_tpu.models.sfd import S3FD
    from blindshadowremoval_tpu.train.trainer import build_generator

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    h, w = args.size
    images = [rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
              for _ in range(args.images)]
    # plausible centered face boxes (the detector's contract)
    boxes = [(w * 0.3, h * 0.2, w * 0.7, h * 0.8)] * args.images

    cfg = get_config("in_the_wild", compute_dtype="bfloat16", fold_bn=False,
                     device_geometry=True,
                     checkpoint_dir="/tmp/bench_e2e_ckpt")
    gen = build_generator(cfg)
    z3 = np.zeros((1, 256, 256, 3), np.float32)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.asarray(z3),
                                 jnp.asarray(z3), None)

    sfd_vars = jax.jit(S3FD().init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, args.det_size, args.det_size, 3)))
    fan_vars = jax.jit(FAN(num_modules=4).init)(
        jax.random.PRNGKey(2), jnp.zeros((1, INPUT_RES, INPUT_RES, 3)))

    print("building pipeline (warms all three stages) ...", flush=True)
    pipe = DeshadowPipeline(
        cfg, gen_vars, fan_variables=fan_vars, sfd_variables=sfd_vars,
        det_size=args.det_size, det_batch=args.det_batch,
        fan_batch=args.fan_batch, fan_modules=4, min_face=0,
        batch_size=args.serve_batch, compact_output=True,
        compact_ingress=True)
    pipe.detector.score_thresh = 0.9   # random-weight bench: see docstring

    # ---- detect stage (device trunk + host letterbox/decode/NMS)
    pipe.detector(images[:args.det_batch])          # warm the full path
    t0 = time.perf_counter()
    dets = pipe.detector(images)
    t_det = time.perf_counter() - t0
    print(f"detect: {args.images / t_det:.1f} images/s "
          f"({1e3 * t_det / args.images:.2f} ms/image, "
          f"{sum(len(d) for d in dets)} boxes kept)", flush=True)

    # ---- align + crop + deshadow through the pipeline (caller boxes)
    pipe(images[:args.serve_batch], boxes=boxes[:args.serve_batch])  # warm
    t0 = time.perf_counter()
    res = pipe(images, boxes=boxes)
    t_acd = time.perf_counter() - t0
    faces = sum(r is not None for r in res)
    lt = pipe.last_times
    print(f"align+crop+deshadow: {args.images / t_acd:.1f} images/s "
          f"({faces}/{args.images} faces; align {lt.align:.2f}s "
          f"crop {lt.crop:.2f}s deshadow {lt.deshadow:.2f}s)", flush=True)

    per_img = t_det / args.images + t_acd / args.images
    print(f"e2e composed (stage sums): {1.0 / per_img:.1f} raw images/s "
          f"({1e3 * per_img:.2f} ms/image single-process)", flush=True)

    # ---- composed run_dir A/B: serial stages vs the depth-1 overlapped
    # stage pipeline (eval/e2e.py run_dir overlap=True) on the SAME files,
    # full neural path (no .npy sidecars).  The random-weight detector
    # rarely keeps a box, so fall back to the canonical centered box per
    # image AFTER the real detect work — detect timing stays honest and
    # every downstream stage processes a full load.
    import shutil
    import tempfile

    import cv2

    orig_det = pipe._stage_detect

    def det_with_fallback(imgs_, lms_, bxs_):
        bxs_, dt = orig_det(imgs_, lms_, bxs_)
        for i in range(len(bxs_)):
            if lms_[i] is None and bxs_[i] is None:
                bxs_[i] = (w * 0.3, h * 0.2, w * 0.7, h * 0.8)
        return bxs_, dt

    pipe._stage_detect = det_with_fallback
    tmpd = tempfile.mkdtemp(prefix="bench_e2e_imgs_")
    # 3 chunks at the SERVE batch so the deshadow stage never pads (a
    # chunk smaller than the serving batch wastes the padded lanes) and
    # the stage pipeline has real streaming depth
    n_ab = 3 * args.serve_batch
    for i in range(n_ab):
        im = images[i % len(images)]
        cv2.imwrite(os.path.join(tmpd, f"img{i:04d}.png"),
                    cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
    try:
        for overlap in (False, True):
            outd = tempfile.mkdtemp(prefix="bench_e2e_out_")
            stats = pipe.run_dir(tmpd, outd, batch_files=args.serve_batch,
                                 overlap=overlap)
            name = "overlapped" if overlap else "serial"
            print(f"run_dir {name}: wall {stats['wall']:.2f}s = "
                  f"{stats['images'] / stats['wall']:.1f} raw images/s "
                  f"(stage sums: det {stats['detect']:.2f} "
                  f"align {stats['align']:.2f} crop {stats['crop']:.2f} "
                  f"deshadow {stats['deshadow']:.2f}; "
                  f"{stats['faces']} faces, {stats['written']} written)",
                  flush=True)
            shutil.rmtree(outd, ignore_errors=True)
    finally:
        pipe._stage_detect = orig_det
        shutil.rmtree(tmpd, ignore_errors=True)


if __name__ == "__main__":
    main()
