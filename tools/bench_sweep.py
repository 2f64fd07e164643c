"""Batch-size sweep for the headline inference benchmark.

Reuses bench.py's measurement harness (timed lax.scan chain ending in a
scalar fetch — see bench.py's docstring for why) across batch sizes, in the
same serving configuration bench.py headlines.  Variables are initialized
once (parameters are batch-independent) and reused across the sweep.

Usage: python tools/bench_sweep.py [--int8-head] [--batches 64 96 128 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# bench.py is the repo-root driver harness, not part of the installed
# package — resolve it relative to this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (ITERS, init_serving_variables, make_gen, make_inputs,  # noqa: E402
                   timed_scan)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[64, 96, 128, 192, 256])
    ap.add_argument("--int8-head", action="store_true",
                    help="sweep the opt-in int8-head path instead of the "
                         "production bf16 configuration")
    args = ap.parse_args()

    gen = make_gen(int8_head=args.int8_head)
    img, uv, reg = make_inputs(args.batches[0])
    gen, variables = init_serving_variables(gen, img, uv, reg)

    for batch in args.batches:
        img, uv, reg = make_inputs(batch)
        best = timed_scan(gen, variables, img, uv, reg)
        print(json.dumps({"batch": batch,
                          "faces_per_sec": round(batch * ITERS / best, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
