"""Calibrate the int8 head's static activation scale on real data.

The int8 output head quantizes its input with a per-sample dynamic max —
a data-dependent reduction that costs a full extra bandwidth pass
(~18 us/face, profile in docs/perf.md).  A static calibrated bound removes
the pass (ops/quant.py).  This tool:

  1. restores a trained checkpoint, runs real UCB images, and captures the
     head's input activations (the up3 ConvBlock output);
  2. reports the observed abs-max distribution and a suggested bound
     (1.25x the max);
  3. quantifies the quality cost exactly: head output computed f32 vs
     int8-dynamic vs int8-static on the captured activations (PSNR).

Usage: python tools/calibrate_int8_head.py --ckpt runs/demo_gsc [--images 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/demo_gsc")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction,
                default=True,
                help="force the CPU backend (--no-cpu to calibrate on the attached TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:   # statistics run fine on CPU; no tunnel needed
        jax.config.update("jax_platforms", "cpu")
        from jax.extend import backend as _jeb

        _jeb.clear_backends()

    import jax.numpy as jnp

    from blindshadowremoval_tpu.cli import _restore
    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.ops.quant import int8_conv

    cfg = get_config(
        "ucb", data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=1, compute_dtype="float32", checkpoint_dir=args.ckpt)
    variables, _, cfg = _restore(cfg)
    import dataclasses

    from blindshadowremoval_tpu.train.trainer import build_generator

    # the live-BatchNorm f32-egress tree _restore's template used
    gen = build_generator(dataclasses.replace(
        cfg, fold_bn=False, egress_dtype="float32"))
    ds = Dataset(cfg, "test")

    @jax.jit
    def head_input(v, img, uv, reg):
        _, inter = gen.apply(
            v, img, uv, reg, capture_intermediates=lambda m, _: m.name == "up3")
        return inter["intermediates"]["up3"]["__call__"][0]

    acts, maxes = [], []
    it = iter(ds)
    for _ in range(args.images):
        batch, box, name = next(it)
        y = np.asarray(head_input(variables, jnp.asarray(batch["img"]),
                                  jnp.asarray(batch["uv"]),
                                  jnp.asarray(batch["reg"])))
        acts.append(y)
        maxes.append(float(np.abs(y).max()))
        print(f"{os.path.basename(name)}: head-input absmax {maxes[-1]:.3f}")

    bound = 1.25 * max(maxes)
    print(f"\nobserved max {max(maxes):.3f}, suggested static bound "
          f"{bound:.3f}")

    # quality: head outputs f32 vs int8-dynamic vs int8-static
    kernel = np.asarray(variables["params"]["head"]["Conv_0"]["kernel"])
    bias = np.asarray(variables["params"]["head"]["Conv_0"]["bias"])

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        rng = float(np.abs(a).max()) or 1.0
        return 10 * np.log10(rng * rng / mse) if mse else 99.0

    f32o, dyno, stato = [], [], []
    for y in acts:
        yj = jnp.asarray(y)
        ref = np.asarray(jax.lax.conv_general_dilated(
            yj, jnp.asarray(kernel), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias)
        f32o.append(ref)
        dyno.append(np.asarray(int8_conv(yj, jnp.asarray(kernel),
                                         jnp.asarray(bias))))
        stato.append(np.asarray(int8_conv(yj, jnp.asarray(kernel),
                                          jnp.asarray(bias),
                                          static_scale=float(bound))))
    f32a, dyna, stata = (np.concatenate(x) for x in (f32o, dyno, stato))
    print(f"head output parity vs f32: dynamic {psnr(f32a, dyna):.1f} dB, "
          f"static({bound:.2f}) {psnr(f32a, stata):.1f} dB")
    print(f"\nset: get_config(..., int8_head=True, "
          f"int8_head_scale={bound:.3f})")


if __name__ == "__main__":
    main()
