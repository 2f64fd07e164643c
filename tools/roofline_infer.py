"""Roofline analysis of the headline inference forward.

Lowers the exact bench.py serving forward AOT, reads XLA's compiled cost
analysis (flops + bytes accessed after fusion), and compares the measured
step time against the two speed-of-light bounds on the target chip:

    t_compute   = flops / peak_flops          (MXU bound)
    t_bandwidth = bytes / peak_hbm_bandwidth  (HBM bound)
    speed_of_light = max(t_compute, t_bandwidth)

The headline model is small (tens of GFLOP per face) and elementwise-heavy
at 256², so the interesting question is which wall it sits against and how
far from it.  Peaks default to TPU v5e (bf16 394 TFLOP/s, HBM 819 GB/s) —
override with --peak-tflops / --peak-gbps for other chips.

The model/harness comes straight from bench.py (make_gen → production
config: bf16 compute, folded BN, bf16 egress; --int8-head opts into the
throughput-first head with self-calibrated bounds), so the roofline always
describes the configuration the headline actually ships.

Usage: python tools/roofline_infer.py [--batch 128] [--iters 64]
                                      [--int8-head]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


# bench.py is the repo-root driver harness, not part of the installed
# package -- resolve it relative to this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # the headline harness: same model, same measurement pattern


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--peak-tflops", type=float, default=394.0,
                    help="chip peak bf16 TFLOP/s (v5e: 394)")
    ap.add_argument("--peak-gbps", type=float, default=819.0,
                    help="chip peak HBM GB/s (v5e: 819)")
    ap.add_argument("--int8-head", action="store_true",
                    help="analyze the opt-in int8-head path instead of the "
                         "production bf16+folded-BN config")
    ap.add_argument("--no-fold-bn", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    gen = bench.make_gen(int8_head=args.int8_head,
                         fold_bn=not args.no_fold_bn)
    img, uv, reg = bench.make_inputs(batch=args.batch)
    gen, variables = bench.init_serving_variables(gen, img, uv, reg)
    b = args.batch

    def fwd(v, i, u, r):
        _, rgb, _, dif = gen.apply(v, i, u, r)
        return jnp.mean(rgb.astype(jnp.float32)) \
            + jnp.mean(dif.astype(jnp.float32))

    lowered = jax.jit(fwd).lower(variables, img, uv, reg)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    # timed with the tunnel-safe shared harness (bench.timed_scan): K
    # forwards chained in one jitted scan, one scalar fetch, staleness
    # asserted between trials
    wall = bench.timed_scan(gen, variables, img, uv, reg, iters=args.iters)
    step_s = wall / args.iters

    t_compute = flops / (args.peak_tflops * 1e12)
    t_bandwidth = byts / (args.peak_gbps * 1e9)
    sol = max(t_compute, t_bandwidth)
    print(json.dumps({
        "config": ("int8_head" if args.int8_head else "production") +
                  ("" if args.no_fold_bn else "+fold_bn"),
        "batch": b,
        "gflops_per_face": flops / b / 1e9,
        "mb_accessed_per_face": byts / b / 1e6,
        "arithmetic_intensity_flop_per_byte": flops / max(byts, 1.0),
        "measured_ms_per_batch": step_s * 1e3,
        "faces_per_sec": b / step_s,
        "t_compute_ms": t_compute * 1e3,
        "t_bandwidth_ms": t_bandwidth * 1e3,
        "bound": "bandwidth" if t_bandwidth > t_compute else "compute",
        "speed_of_light_ms": sol * 1e3,
        "fraction_of_speed_of_light": sol / step_s,
    }, indent=1))


if __name__ == "__main__":
    main()
