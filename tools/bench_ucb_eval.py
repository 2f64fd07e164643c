"""Per-image UCB eval latency on the real chip: host-orchestrated vs fused.

Runs the UCB evaluator over real UCB images twice — `run_one` (the
host-orchestrated path: forward + 2 connected-component calls + metrics =
4+ device round trips/image) and `run_one_fused` (eval/fused.py: ONE jitted
call) — and reports post-compile per-image wall-clock.  On a remote-attached
chip (axon tunnel) the round trips dominate, which is exactly what the
fused path removes.

Timing note: each per-image iteration ends in device->host fetches (the
metrics floats / output arrays), so wall-clock between images is an honest
end-to-end latency measure even through the tunnel.

Usage: python tools/bench_ucb_eval.py [--images 8] [--views 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--compact-ingress", action="store_true",
                    help="uint16 fixed-point view upload (the CLI default)")
    args = ap.parse_args()

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

    print("backend:", jax.default_backend(), jax.devices()[0])
    cfg = get_config(
        "ucb", data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
        eval_views=args.views, compute_dtype=args.dtype, part_mask_root=REF,
        compact_ingress=args.compact_ingress,
        checkpoint_dir="/tmp/bench_ucb")
    os.makedirs("/tmp/bench_ucb", exist_ok=True)

    ds = Dataset(cfg, "test")
    from blindshadowremoval_tpu.train.trainer import build_generator

    g = build_generator(cfg)
    z3 = np.zeros((1, 64, 64, 3), np.float32)
    variables = g.init(jax.random.PRNGKey(0), z3, z3,
                       np.zeros((1, 64, 64, 6), np.float32))
    ev = UCBEvaluator(cfg, variables)

    # pre-parse the host batches so parsing isn't in the timed region
    items = []
    it = iter(ds)
    for i in range(args.images):
        batch, box, name = next(it)
        items.append((batch, box, name, ev._load_part_masks(REF, i)))

    results = {}
    for label, runner in (("host", ev.run_one), ("fused", ev.run_one_fused)):
        t_first = time.perf_counter()
        runner(*_args(items[0], label))
        compile_s = time.perf_counter() - t_first
        t0 = time.perf_counter()
        for item in items[1:]:
            runner(*_args(item, label))
        per_img = (time.perf_counter() - t0) / max(len(items) - 1, 1)
        results[label] = {"compile_s": round(compile_s, 2),
                          "per_image_s": round(per_img, 3)}
        print(label, results[label], flush=True)

    print(json.dumps({"bench": "ucb_eval", "views": args.views,
                      "dtype": args.dtype,
                      "compact_ingress": args.compact_ingress, **results}))


def _args(item, label):
    batch, box, name, parts = item
    return (batch, box, f"{label}_{name.split('/')[-1]}", parts)


if __name__ == "__main__":
    main()
