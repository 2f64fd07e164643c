"""Final-output parity of serving configurations vs the f32 eval path.

The headline bench (bench.py) must ride a configuration whose FINAL outputs
— the in-the-wild deshadowed prediction and the UCB heuristic composite —
hold >= 40 dB PSNR against the f32 TF-parity path on a TRAINED checkpoint.
Head-output parity is not enough: the `dif > 0.1` hole binarization and the
heuristic mask thresholds amplify small head deltas into different hole /
component patterns (docs/perf.md "Quality context"), which is exactly what
sank the round-2 int8 headline (~22 dB final-output).

This tool restores a trained checkpoint once and scores each candidate
serving configuration against the f32 reference configuration:

  * in-the-wild (sample_imgs/02165, reference test_step_FFHQ analog):
    PSNR of clip(con_rgb) and of the face-gated shadow map;
  * UCB (train_test_GSC.py:360-748 protocol, N images): PSNR of the
    heuristic composite, pixel disagreement of the detected mask, and the
    delta of the reported PSNR metric itself.

Usage:
  python tools/parity_serving.py --ckpt runs/demo_gsc [--ucb-images 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


REF = "/root/reference"


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(peak * peak / mse) if mse else 99.0


# candidate serving configurations, applied as overrides on the eval config.
# "precision" is jax.default_matmul_precision for the run — load-bearing on
# TPU, where a float32 conv at DEFAULT precision executes as a SINGLE bf16
# MXU pass (~1e-3 relative noise): the round-3 measurement showed even
# exact-algebra f32 BN folding sitting at ~31 dB final-output parity at
# DEFAULT, because that bf16-pass noise flips `dif > 0.1` hole pixels
# (models/generator.py:113) just like any other perturbation.  True f32 on
# TPU is "highest" (6-pass); "high" (bf16_3x, ~f32-grade dot products at 3
# passes) is the fast near-exact tier.  The REFERENCE configuration is
# f32 @ highest — the faithful port of the CPU TF-parity numerics.
CONFIGS = {
    "f32": dict(compute_dtype="float32", fold_bn=False,
                egress_dtype="float32", int8_head=False,
                precision="highest"),
    "f32+fold": dict(compute_dtype="float32", fold_bn=True,
                     egress_dtype="float32", int8_head=False,
                     precision="highest"),
    "f32+fold@high": dict(compute_dtype="float32", fold_bn=True,
                          egress_dtype="float32", int8_head=False,
                          precision="high"),
    "f32+fold@default": dict(compute_dtype="float32", fold_bn=True,
                             egress_dtype="float32", int8_head=False,
                             precision="default"),
    "bf16": dict(compute_dtype="bfloat16", fold_bn=False,
                 egress_dtype="float32", int8_head=False,
                 precision="default"),
    "bf16+fold+bf16egress": dict(compute_dtype="bfloat16", fold_bn=True,
                                 egress_dtype="bfloat16", int8_head=False,
                                 precision="default"),
    "bf16+fold+int8head": dict(compute_dtype="bfloat16", fold_bn=True,
                               egress_dtype="bfloat16", int8_head=True,
                               int8_head_scale=0.0,   # 0.0 = AUTO
                               precision="default"),
    # split precision (VERDICT r3 #5): int8 only for the `con` offset
    # channel, bf16 for the tanh-gain channel feeding the dif>0.1 holes
    "bf16+fold+int8split": dict(compute_dtype="bfloat16", fold_bn=True,
                                egress_dtype="bfloat16", int8_head=False,
                                int8_head_split=True,
                                int8_head_scale=0.0,   # 0.0 = AUTO
                                precision="default"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/demo_gsc")
    ap.add_argument("--ucb-images", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend instead of the TPU")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of configurations to "
                         "score (f32 is always included as the reference); "
                         "default: all")
    args = ap.parse_args()

    configs = CONFIGS
    if args.configs:
        wanted = set(args.configs.split(",")) | {"f32"}
        unknown = wanted - set(CONFIGS)
        if unknown:
            ap.error(f"unknown configs {sorted(unknown)}; "
                     f"available: {', '.join(CONFIGS)}")
        configs = {k: v for k, v in CONFIGS.items() if k in wanted}

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        from jax.extend import backend as _jeb

        _jeb.clear_backends()

    from blindshadowremoval_tpu.cli import _restore
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.eval.evaluators import (
        InTheWildEvaluator, UCBEvaluator)
    from blindshadowremoval_tpu.models.folding import fold_batch_norm
    from blindshadowremoval_tpu.ops.calibration import calibrate_config

    base = get_config(
        "ucb",
        data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        checkpoint_dir=args.ckpt, compute_dtype="float32",
        fold_bn=False, egress_dtype="float32", int8_head=False)
    raw_vars, _, _ = _restore(base)         # live-BN f32 tree

    # load the eval batches ONCE; reuse across configurations
    ds_ucb = Dataset(base, "test")
    ucb_batches = []
    it = iter(ds_ucb)
    ev0 = UCBEvaluator(base, raw_vars)
    for i in range(args.ucb_images):
        batch, box, name = next(it)
        parts = ev0._load_part_masks(REF, i)
        ucb_batches.append((batch, box, name, parts))

    wild_cfg = get_config(
        "in_the_wild",
        data_dirs_test=(os.path.join(REF, "sample_imgs", "*"),),
        checkpoint_dir=args.ckpt, compute_dtype="float32",
        fold_bn=False, egress_dtype="float32", int8_head=False,
        eval_views=1)
    ds_wild = Dataset(wild_cfg, "test")
    wild = next(iter(ds_wild))

    results = {}
    for cname, overrides in configs.items():
        overrides = dict(overrides)
        precision = overrides.pop("precision", "default")
        cfg = dataclasses.replace(base, **overrides)
        cfg = calibrate_config(cfg, raw_vars)
        variables = fold_batch_norm(raw_vars) if cfg.fold_bn else raw_vars

        # jit traces happen on first call, inside this context, so the
        # ambient precision binds into every conv/matmul of the config
        with jax.default_matmul_precision(precision):
            ev = UCBEvaluator(cfg, variables)
            ucb_out = [ev.run_one_fused(b, box, name, parts)
                       for b, box, name, parts in ucb_batches]
            evw = InTheWildEvaluator(
                dataclasses.replace(wild_cfg, **overrides), variables)
            wout = evw.run_one(*wild)
        results[cname] = {"ucb": ucb_out, "wild": wout}
        del ev, evw

    ref = results["f32"]
    report = {}
    for cname in configs:
        if cname == "f32":
            continue
        r = results[cname]
        comp_psnr = [psnr(a["pred"], b["pred"])
                     for a, b in zip(r["ucb"], ref["ucb"])]
        mask_dis = [float(np.mean(a["detected"] != b["detected"]))
                    for a, b in zip(r["ucb"], ref["ucb"])]
        metric_delta = [abs(a["psnr"] - b["psnr"])
                        for a, b in zip(r["ucb"], ref["ucb"])]
        report[cname] = {
            "wild_pred_psnr_db": round(
                psnr(r["wild"]["pred"], ref["wild"]["pred"]), 1),
            "wild_mask_psnr_db": round(
                psnr(r["wild"]["mask_pred"], ref["wild"]["mask_pred"]), 1),
            "ucb_composite_psnr_db_min": round(min(comp_psnr), 1),
            "ucb_composite_psnr_db_mean": round(
                float(np.mean(comp_psnr)), 1),
            "ucb_detected_mask_disagree_max": round(max(mask_dis), 4),
            "ucb_metric_psnr_delta_max_db": round(max(metric_delta), 3),
        }
        print(cname, json.dumps(report[cname]), flush=True)

    print("\nJSON:", json.dumps(report))


if __name__ == "__main__":
    main()
