"""Command-line interface.

The reference selects modes by editing source (`README.md:46-58`: change
DATA_DIR_TEST, swap `fsr.testFFHQ` -> `fsr.test`, flip the map-fn line in
dataset.py).  Here every mode is a subcommand over the same config presets:

  python -m blindshadowremoval_tpu infer --data 'sample_imgs/*' --ckpt DIR
  python -m blindshadowremoval_tpu ucb   --data 'UCB/train/input/*' \
      --part-masks . --ckpt DIR
  python -m blindshadowremoval_tpu sfw   --data 'SFW/*' --ckpt DIR
  python -m blindshadowremoval_tpu sfw-video --data 'SFW/*' --ckpt DIR
  python -m blindshadowremoval_tpu train --data 'Helen/bin/*' --val ... \
      --ckpt DIR
  python -m blindshadowremoval_tpu preprocess --input DIR --output DIR
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--ckpt", default="./checkpoints",
                   help="checkpoint directory (restore-latest)")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--variant", default=None,
                   choices=[None, "gsc", "tsm", "rgb"])
    p.add_argument("--int8-head", action="store_true",
                   help="serve the output head int8 (~+11%% throughput; "
                        "parity figures in docs/perf.md). Activation bounds "
                        "are auto-calibrated per channel from the restored "
                        "checkpoint's BatchNorm statistics")
    p.add_argument("--int8-head-scale", type=float, default=0.0,
                   help="override the auto-calibrated int8 activation bound "
                        "with one scalar (tools/calibrate_int8_head.py); "
                        "negative = dynamic per-sample max (costs an extra "
                        "bandwidth pass). Default 0 = auto per-channel from "
                        "the checkpoint")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold eval-mode BatchNorms into the conv kernels "
                        "at restore time (identical math, fewer elementwise "
                        "HBM passes; serving/eval only — models/folding.py)")
    p.add_argument("--seed", type=int, default=0)


def build_parser():
    ap = argparse.ArgumentParser(
        prog="blindshadowremoval_tpu",
        description="TPU-native blind facial shadow removal")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name, helptext in [
        ("infer", "in-the-wild inference (reference: testFFHQ)"),
        ("ucb", "UCB quantitative eval (reference: test)"),
        ("sfw", "SFW shadow segmentation eval (reference: testsfw)"),
        ("sfw-video", "SFW per-frame video removal (reference: testsfw_video)"),
    ]:
        p = sub.add_parser(name, help=helptext)
        p.add_argument("--data", required=True, help="glob of test dirs")
        p.add_argument("--device-geometry", action="store_true",
                       help="rasterize UV/offset/face maps in-graph from "
                            "landmarks instead of on the host (numerically "
                            "identical; ~20x less host work per view)")
        _add_common(p)
        if name == "infer":
            p.add_argument(
                "--engine", choices=("evaluator", "serving"),
                default="evaluator",
                help="'evaluator' mirrors the reference's per-image "
                     "testFFHQ loop; 'serving' batches all images through "
                     "the warm ShadowRemovalService (device-rasterized "
                     "geometry + quantized egress, ~8x faster end-to-end; "
                     "gsc/rgb only)")
        if name in ("infer", "ucb"):
            p.add_argument(
                "--eval-views", type=int, default=None,
                help="views per sample: anchor + N-1 random same-folder refs "
                     "(reference protocol and default: 10). "
                     "--eval-views 1 evaluates gsc/rgb ~3x faster "
                     "with statistically equivalent metrics (bf16 batching "
                     "can flip individual postprocess thresholds: measured "
                     "19.15 dB/0.720 vs 19.13 dB/0.730 on UCB-100); does "
                     "not apply to the tsm ucb protocol (fixed "
                     "anchor+mirror pair)")
        if name == "ucb":
            p.add_argument("--part-masks", required=True,
                           help="root containing the UCB_input_images_* dirs")
            p.add_argument("--no-compact-ingress", action="store_true",
                           help="upload eval views as f32 instead of uint16 "
                                "fixed-point (compact ingress is on by "
                                "default for the CLI: 2x less tunnel "
                                "traffic, metrics move < 0.001 dB)")
            p.add_argument("--images-per-call", type=int, default=8,
                           help="images per fused device call (tail padded; "
                                "identical metrics to per-image). >1 "
                                "amortizes the per-call tunnel round trip "
                                "that dominates UCB-100 wall time; 1 "
                                "restores the per-image path. Forced to 1 "
                                "for the rgb simple-composite protocol")
            p.add_argument("--rgb-heuristics", action="store_true",
                           help="with --variant rgb, run the generalized "
                                "heuristic post-processor instead of the "
                                "reference's simple face-mask composite "
                                "(train_RGB_test.py:403-505)")
        if name == "sfw-video":
            p.add_argument("--export-bbox", default=None)

    p = sub.add_parser("train", help="GAN training (reference: train)")
    p.add_argument("--data", required=True, nargs="+")
    p.add_argument("--val", default=None, nargs="+")
    p.add_argument("--shadow-masks", default="",
                   help="external shadow PNG library for ShadowMaker")
    p.add_argument("--device-geometry", action="store_true",
                   help="rasterize UV/offset/face maps in-graph instead of "
                        "on the host (2x faster host pipeline)")
    p.add_argument("--device-darken", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="derive the jittered (gt, img_dark) pair in the "
                        "jitted train step instead of on the host: drops "
                        "img_dark from the host->device wire (3 of 7 image "
                        "channels) and the per-sample host tone-curve work. "
                        "ON by default (measured in docs/perf.md \"fit() "
                        "end-to-end\"); --no-device-darken restores the "
                        "host f32 darkening (unclamped CTM excursions — "
                        "see config.device_darken)")
    p.add_argument("--steps-per-epoch", type=int, default=2000)
    p.add_argument("--max-epoch", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-decay", type=float, default=1.0,
                   help="staircase LR decay factor applied every "
                        "--lr-decay-epochs epochs (1.0 = constant). The "
                        "reference declares 0.9/10-epochs but never wires "
                        "it (train_test_GSC.py:41,48,162); here it is a "
                        "real schedule. Changes the optimizer state tree — "
                        "use a fresh checkpoint dir")
    p.add_argument("--lr-decay-epochs", type=float, default=10.0)
    p.add_argument("--log-every", type=int, default=1,
                   help="fetch/print losses every N steps; each fetch syncs "
                        "the device (one ~40 ms tunnel roundtrip on remote "
                        "TPU), so raise this to keep the step pipeline full")
    p.add_argument("--vgg-weights", default=None,
                   help="npz of pretrained VGG-19 weights for the perceptual "
                        "loss (tools/convert_vgg_weights.py converts the "
                        "Keras ImageNet h5). Without it the perceptual term "
                        "uses a RANDOM-init VGG — a valid feature loss, but "
                        "not the reference's (train_test_GSC.py:128)")
    p.add_argument("--select-best", action="store_true",
                   help="after each epoch, probe quality on a UCB subset "
                        "(fused eval, 1 view) and retain the best-by-PSNR "
                        "checkpoint under <ckpt>/best — long runs cannot "
                        "silently regress past their best eval score. "
                        "Needs --probe-data and --probe-part-masks")
    p.add_argument("--probe-data", default=None,
                   help="UCB input image glob for the --select-best probe")
    p.add_argument("--probe-part-masks", default=None,
                   help="root containing the UCB_input_images_* dirs for "
                        "the --select-best probe")
    p.add_argument("--probe-images", type=int, default=20,
                   help="images in the --select-best probe subset")
    p.add_argument("--no-compact-ingress", action="store_true",
                   help="upload train batches as f32 instead of uint16/8 "
                        "fixed-point (compact ingress is on by default for "
                        "the CLI: the [0,1] image planes are the dominant "
                        "host->device transfer)")
    p.add_argument("--u8-ingress", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="quantize the compact train wire at 1/255 (uint8) "
                        "instead of 1/65535 — half the bytes again; the "
                        "source PNGs are 8-bit, so this sits at the source "
                        "quantization (loss deltas measured in docs/perf.md"
                        "). --no-u8-ingress keeps the uint16 wire")
    p.add_argument("--probe-metric", default="psnr",
                   choices=["psnr", "auc"],
                   help="quality axis for --select-best: 'psnr' probes a "
                        "UCB subset (fused eval; needs --probe-part-masks); "
                        "'auc' probes SFW shadow-segmentation ROC-AUC "
                        "against *_label.png ground truth — the TSM "
                        "variant's native metric (--probe-data points at "
                        "an SFW-format dir glob; "
                        "tools/make_sfw_eval_set.py builds one)")
    _add_common(p)

    p = sub.add_parser("preprocess",
                       help="offline crop/align (reference: dataprocess.py)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--size", type=int, default=256)

    p = sub.add_parser(
        "e2e",
        help="raw uncropped images -> deshadowed faces, one warm pass "
             "(detect + align + crop + deshadow; replaces the reference's "
             "three manual scripts)")
    p.add_argument("--input", required=True,
                   help="dir of raw PNGs; a sibling <name>.npy 68x2 "
                        "landmark file (the reference's shipped contract) "
                        "skips the neural detect+align stages for that "
                        "image")
    p.add_argument("--output", required=True)
    p.add_argument("--fan-weights", default=None,
                   help="npz of converted 2D-FAN weights for the align "
                        "stage (tools/convert_fan_weights.py)")
    p.add_argument("--sfd-weights", default=None,
                   help="npz of converted S3FD weights for the detect "
                        "stage (tools/convert_sfd_weights.py)")
    p.add_argument("--det-size", type=int, default=640,
                   help="canonical detector input (host letterbox) — the "
                        "detector compiles once for any image size")
    p.add_argument("--det-batch", type=int, default=4)
    p.add_argument("--fan-batch", type=int, default=16)
    p.add_argument("--serve-batch", type=int, default=16,
                   help="generator batch in the deshadow stage")
    p.add_argument("--batch-files", type=int, default=16,
                   help="images read from disk per pipeline call")
    p.add_argument("--overlap", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the read/detect/align/crop/deshadow stages as "
                        "a depth-1 thread pipeline over file chunks, so "
                        "composed throughput approaches the slowest stage "
                        "instead of the serial sum (docs/perf.md); "
                        "--no-overlap restores strictly serial stages")
    p.add_argument("--min-face", type=int, default=250,
                   help="reject faces below this crop side "
                        "(dataprocess.py:66)")
    _add_common(p)

    p = sub.add_parser("landmarks",
                       help="offline landmark detection "
                            "(reference: bmvc2022-dataprocess.py)")
    p.add_argument("--input", required=True)
    p.add_argument("--fan-weights", default=None,
                   help="npz of converted 2D-FAN weights "
                        "(tools/convert_fan_weights.py) — runs the in-repo "
                        "JAX FAN (models/fan.py). Without it the optional "
                        "face_alignment package is used instead")
    p.add_argument("--sfd-weights", default=None,
                   help="npz of converted S3FD detector weights "
                        "(tools/convert_sfd_weights.py) — detect the face "
                        "box in-repo (models/sfd.py) before the FAN pass")
    p.add_argument("--face-box", default=None,
                   help="x1,y1,x2,y2 face box applied to every image on the "
                        "JAX FAN path (overrides detection; default without "
                        "--sfd-weights: whole frame)")
    return ap


def _restore(cfg):
    import dataclasses

    from blindshadowremoval_tpu.train.trainer import init_generator_vars
    from blindshadowremoval_tpu.utils.checkpoint import CheckpointManager

    # eval needs ONLY the generator sub-tree: init it (host CPU, cheap —
    # no discriminators/VGG/optimizer moments) as the restore template and
    # partially restore just gen params+stats (utils/checkpoint.py
    # restore_eval).  This is also what makes eval robust to optimizer-
    # state tree differences, e.g. checkpoints trained with --lr-decay.
    # The template always uses the live-BatchNorm f32-egress tree; the
    # serving flags below transform cfg/variables for the eval paths only.
    base = dataclasses.replace(cfg, fold_bn=False, egress_dtype="float32")
    _, gvars = init_generator_vars(base)
    mgr = CheckpointManager(cfg.checkpoint_dir)
    variables, step = mgr.restore_eval(gvars["params"],
                                       gvars.get("batch_stats", {}))
    print(f"Restore from step {step}")
    from blindshadowremoval_tpu.ops.calibration import calibrate_config

    cfg = calibrate_config(cfg, variables)
    if cfg.fold_bn:
        from blindshadowremoval_tpu.models.folding import fold_batch_norm

        variables = fold_batch_norm(variables)
    return variables, mgr, cfg


def main(argv=None):
    args = build_parser().parse_args(argv)

    # every CLI path jit-compiles; on remote-attached backends a persistent
    # cache turns minutes of per-process recompiles into reloads
    from blindshadowremoval_tpu.utils.compilecache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from blindshadowremoval_tpu.config import get_config

    if args.cmd == "preprocess":
        return run_preprocess(args)
    if args.cmd == "landmarks":
        return run_landmarks(args)
    if args.cmd == "e2e":
        return run_e2e(args)

    preset = {"infer": "in_the_wild", "ucb": "ucb", "sfw": "sfw",
              "sfw-video": "sfw_video", "train": "train"}[args.cmd]
    overrides = dict(img_size=args.img_size, checkpoint_dir=args.ckpt)
    if args.variant:
        overrides["variant"] = args.variant
    if getattr(args, "int8_head", False):
        overrides["int8_head"] = True
    if getattr(args, "int8_head_scale", 0.0):
        overrides["int8_head_scale"] = args.int8_head_scale
    if getattr(args, "fold_bn", False) and args.cmd != "train":
        overrides["fold_bn"] = True
    if args.cmd == "train":
        overrides.update(
            data_dirs=tuple(args.data),
            data_dirs_val=tuple(args.val or ()),
            shadow_mask_dir=args.shadow_masks,
            steps_per_epoch=args.steps_per_epoch,
            max_epoch=args.max_epoch, batch_size=args.batch_size,
            learning_rate=args.lr,
            lr_decay_factor=args.lr_decay,
            lr_decay_epochs=args.lr_decay_epochs,
            log_every_steps=args.log_every,
            device_geometry=args.device_geometry,
            device_darken=args.device_darken)
        if not args.no_compact_ingress:
            overrides["compact_ingress"] = True
            if args.u8_ingress:
                overrides["ingress_u8"] = True
        if args.select_best:
            needs_masks = getattr(args, "probe_metric", "psnr") == "psnr"
            if not args.probe_data or (needs_masks
                                       and not args.probe_part_masks):
                print("--select-best needs --probe-data"
                      + (" and --probe-part-masks"
                         if needs_masks else " (an SFW-format dir glob)"),
                      file=sys.stderr)
                return 2
            overrides["data_dirs_test"] = (args.probe_data,)
            if args.probe_part_masks:
                overrides["part_mask_root"] = args.probe_part_masks
    else:
        overrides["data_dirs_test"] = (args.data,)
        if getattr(args, "eval_views", None) is not None:
            if args.eval_views < 1:
                print(f"--eval-views must be >= 1, got {args.eval_views}",
                      file=sys.stderr)
                return 2
            overrides["eval_views"] = args.eval_views
        if getattr(args, "device_geometry", False):
            overrides["device_geometry"] = True
        if args.cmd == "ucb" and not getattr(args, "no_compact_ingress",
                                             False):
            overrides["compact_ingress"] = True
    cfg = get_config(preset, **overrides)

    # the TSM UCB protocol forwards a fixed anchor+mirror pair with frame=1
    # (train_with_TSM.py:431-433; Dataset.parse_test_ucb_mirror), so
    # --eval-views does not apply there — reject it rather than silently
    # ignoring it.  (infer/sfw run frame=1 and sfw-video packs fixed
    # 10-frame batches — any eval_views works there.)
    if cfg.variant == "tsm" and args.cmd == "ucb" and \
            getattr(args, "eval_views", None) is not None:
        print("--eval-views does not apply to --variant tsm ucb eval: the "
              "TSM protocol always forwards the anchor + mirrored pair "
              "(train_with_TSM.py:431-433)", file=sys.stderr)
        return 2

    from blindshadowremoval_tpu.data.dataset import Dataset

    if args.cmd == "train":
        return run_train(cfg, args)

    variables, _, cfg = _restore(cfg)
    from blindshadowremoval_tpu.eval.evaluators import (
        InTheWildEvaluator,
        SFWEvaluator,
        SFWVideoEvaluator,
        UCBEvaluator,
    )

    def _check(ds):
        if not ds.name_list:
            print(f"no samples matched {cfg.data_dirs_test} "
                  "(need <name>.png + <name>.npy landmark pairs)",
                  file=sys.stderr)
        return ds

    if args.cmd == "infer":
        if getattr(args, "engine", "evaluator") == "serving":
            return run_infer_serving(cfg, variables, args)
        ds = _check(Dataset(cfg, "test", seed=args.seed))
        InTheWildEvaluator(cfg, variables).run(ds)
    elif args.cmd == "ucb":
        ds = Dataset(cfg, "test", seed=args.seed)
        rgb_heur = getattr(args, "rgb_heuristics", False)
        ipc = args.images_per_call
        if cfg.variant == "rgb" and not rgb_heur:
            ipc = 1   # the simple-composite protocol has no fused step
        results = UCBEvaluator(cfg, variables).run(
            ds, args.part_masks, rgb_heuristics=rgb_heur,
            images_per_call=ipc)
        ps = [r["psnr"] for r in results]
        ss = [r["ssim"] for r in results]
        print(f"UCB mean PSNR {np.mean(ps):.3f}  mean SSIM {np.mean(ss):.4f}")
    elif args.cmd == "sfw":
        ds = Dataset(cfg, "test", dset="sfw", seed=args.seed)
        results = SFWEvaluator(cfg, variables).run(ds)
        print(f"SFW mean AUC {np.mean([r['auc'] for r in results]):.4f}")
    elif args.cmd == "sfw-video":
        ds = Dataset(cfg, "test", dset="sfw", seed=args.seed)
        SFWVideoEvaluator(cfg, variables).run(ds, args.export_bbox)
    return 0


def run_infer_serving(cfg, variables, args):
    """In-the-wild inference through the batched serving engine.

    Same inputs and result strips as the evaluator path (testFFHQ,
    train_test_GSC.py:840-890) but all images stream through one warm
    fixed-shape forward with device-rasterized geometry and quantized
    egress (docs/perf.md) instead of a per-image eval loop."""
    import glob as _glob

    import cv2

    from blindshadowremoval_tpu.eval.serving import ShadowRemovalService
    from blindshadowremoval_tpu.utils.logging import TrainLogger

    names, images, lms = [], [], []
    for pattern in cfg.data_dirs_test:
        for folder in sorted(_glob.glob(pattern)):
            for lm_path in sorted(_glob.glob(folder + "/*.npy")):
                img = cv2.imread(lm_path.rsplit(".", 1)[0] + ".png")
                if img is None:
                    continue
                names.append(lm_path)
                images.append(
                    cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0)
                lms.append(np.load(lm_path))
    if not names:
        print(f"no samples matched {cfg.data_dirs_test} "
              "(need <name>.png + <name>.npy landmark pairs)",
              file=sys.stderr)
        return 1
    svc = ShadowRemovalService(
        cfg, variables, batch_size=min(64, max(1, len(names))),
        compact_output=True, compact_ingress=True)
    results = svc.remove_shadows(images, lms)
    log = TrainLogger(cfg.checkpoint_dir)
    for name, r in zip(names, results):
        log.save_result_image(
            [r["img"][None], r["pred"][None], r["mask_pred"][None] * 2.0],
            name)
    print(f"wrote {len(results)} result strips to "
          f"{cfg.checkpoint_dir}/test/")
    return 0


def run_train(cfg, args):
    import jax

    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.train.loop import fit
    from blindshadowremoval_tpu.train.trainer import Trainer

    vgg_weights = None
    if getattr(args, "vgg_weights", None):
        from blindshadowremoval_tpu.models.vgg import load_weights_npz

        vgg_weights = load_weights_npz(args.vgg_weights)
        print(f"Perceptual loss: pretrained VGG-19 from {args.vgg_weights}")
    trainer = Trainer.shared(cfg, vgg_weights)
    ds_train = Dataset(cfg, "train", seed=args.seed)
    ds_val = Dataset(cfg, "val", seed=args.seed + 1) if cfg.data_dirs_val else None
    fit(cfg, ds_train, ds_val, trainer=trainer,
        select_best=getattr(args, "select_best", False),
        probe_images=getattr(args, "probe_images", 20),
        probe_metric=getattr(args, "probe_metric", "psnr"))
    return 0


def run_e2e(args):
    """Batched raw-image -> deshadowed pipeline (eval/e2e.py).

    The single-pass replacement for the reference's three manual scripts
    (bmvc2022-dataprocess.py + dataprocess.py + train_test_GSC.py main):
    detect + align + crop + deshadow, every neural stage warm and batched.
    """
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.eval.e2e import DeshadowPipeline

    overrides = dict(img_size=args.img_size, checkpoint_dir=args.ckpt,
                     device_geometry=True)
    if args.variant:
        overrides["variant"] = args.variant
    if args.int8_head:
        overrides["int8_head"] = True
    if args.int8_head_scale:
        overrides["int8_head_scale"] = args.int8_head_scale
    if args.fold_bn:
        overrides["fold_bn"] = True
    cfg = get_config("in_the_wild", **overrides)
    variables, _, cfg = _restore(cfg)

    fan_vars = sfd_vars = None
    if args.fan_weights:
        from blindshadowremoval_tpu.models.fan import load_fan_npz

        fan_vars = load_fan_npz(args.fan_weights)
    if args.sfd_weights:
        from blindshadowremoval_tpu.models.sfd import load_sfd_npz

        sfd_vars = load_sfd_npz(args.sfd_weights)

    fan_modules = 4
    if fan_vars is not None:
        fan_modules = 1 + max(int(k[1:]) for k in fan_vars["params"]
                              if k.startswith("m") and k[1:].isdigit())
    pipe = DeshadowPipeline(
        cfg, variables, fan_variables=fan_vars, sfd_variables=sfd_vars,
        det_size=args.det_size, det_batch=args.det_batch,
        fan_batch=args.fan_batch, fan_modules=fan_modules,
        min_face=args.min_face, batch_size=args.serve_batch,
        compact_output=True, compact_ingress=True)
    stats = pipe.run_dir(args.input, args.output,
                         batch_files=args.batch_files,
                         overlap=args.overlap)
    print("e2e:", {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in stats.items()})
    return 0


def run_preprocess(args):
    """Offline crop (dataprocess.py contract): for every <name>.png with
    <name>.npy landmarks under --input, write the 256-crop + rescaled
    landmarks to --output/<name>/."""
    import glob
    import os

    import cv2

    from blindshadowremoval_tpu.geometry.crop import offline_crop

    n_ok = 0
    for png in sorted(glob.glob(os.path.join(args.input, "*.png"))):
        npy = png.rsplit(".", 1)[0] + ".npy"
        if not os.path.isfile(npy):
            continue
        img = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
        res = offline_crop(img, np.load(npy), out_size=args.size)
        if res is None:
            print(f"skip (face too small): {png}")
            continue
        crop, lm = res
        name = os.path.splitext(os.path.basename(png))[0]
        outdir = os.path.join(args.output, name)
        os.makedirs(outdir, exist_ok=True)
        cv2.imwrite(os.path.join(outdir, name + ".png"),
                    cv2.cvtColor(crop.astype(np.uint8), cv2.COLOR_RGB2BGR))
        np.save(os.path.join(outdir, name + ".npy"), lm)
        n_ok += 1
    print(f"preprocessed {n_ok} faces -> {args.output}")
    return 0


def run_landmarks(args):
    """Offline 68-point landmark detection (bmvc2022-dataprocess.py contract).

    With --fan-weights: the in-repo JAX 2D-FAN (models/fan.py) under jit —
    one compile, then one device call per image — optionally preceded by the
    in-repo S3FD face detector (--sfd-weights, models/sfd.py) or an explicit
    --face-box.  Otherwise falls back to the optional `face_alignment`
    package."""
    import glob
    import os

    import cv2

    if getattr(args, "fan_weights", None):
        import functools

        import jax
        import jax.numpy as jnp

        from blindshadowremoval_tpu.models import fan

        variables = fan.load_fan_npz(args.fan_weights)
        n_mod = 1 + max(int(k[1:]) for k in variables["params"]
                        if k.startswith("m") and k[1:].isdigit())
        apply_fn = jax.jit(functools.partial(
            lambda nm, v, x: fan.FAN(num_modules=nm).apply(v, x)[-1], n_mod))
        box = (tuple(float(v) for v in args.face_box.split(","))
               if getattr(args, "face_box", None) else None)
        detector = None
        if box is None and getattr(args, "sfd_weights", None):
            from blindshadowremoval_tpu.models import sfd

            sfd_vars = sfd.load_sfd_npz(args.sfd_weights)
            detector = lambda img: sfd.detect_faces(sfd_vars, img)  # noqa: E731
        for png in sorted(glob.glob(os.path.join(args.input, "*.png"))):
            img = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
            img_box = box
            if detector is not None:
                dets = detector(img)
                if not len(dets):
                    print(f"no face: {png}")
                    continue
                img_box = tuple(dets[0, :4])   # best-scoring box, like fa
            pts = fan.landmarks_from_image(variables, img, box=img_box,
                                           num_modules=n_mod,
                                           apply_fn=apply_fn)
            np.save(png.rsplit(".", 1)[0] + ".npy", pts)
            print(f"landmarks: {png}")
        return 0

    try:
        import face_alignment
    except ImportError:
        print("no --fan-weights given and face_alignment is not installed; "
              "landmark detection needs the FAN CNN (bmvc2022-dataprocess."
              "py:10). Convert a 2DFAN checkpoint with "
              "tools/convert_fan_weights.py, or provide 68x2 .npy landmarks "
              "from any detector.", file=sys.stderr)
        return 2

    fa = face_alignment.FaceAlignment(
        face_alignment.LandmarksType.TWO_D, flip_input=False)
    for png in sorted(glob.glob(os.path.join(args.input, "*.png"))):
        img = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
        preds = fa.get_landmarks(img)
        if not preds:
            print(f"no face: {png}")
            continue
        np.save(png.rsplit(".", 1)[0] + ".npy", preds[0])
        print(f"landmarks: {png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
