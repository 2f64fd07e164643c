"""Capture a device profile of the headline inference forward and print the
top fusions by device time.

jax.profiler traces work through the axon tunnel (docs/perf.md); this is
the tool that found the jnp.choose gather hotspot in round 1.

Usage: python tools/profile_infer.py [--batch 128] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


# sibling import: works both as `python tools/profile_X.py` (sys.path[0]
# is tools/) and from a repo-root cwd (fallback insert below)
try:
    from trace_utils import parse_device_events, print_top  # noqa: E402
except ImportError:  # pragma: no cover - repo-root cwd / embedded use
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_utils import parse_device_events, print_top  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/infer_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--int8-head", action="store_true",
                    help="profile the opt-in int8-head path instead of the "
                         "production bf16+folded-BN config")
    args = ap.parse_args()

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root bench.py harness
    import bench  # the headline harness: identical model configuration

    gen = bench.make_gen(int8_head=args.int8_head)
    img, uv, reg = bench.make_inputs(batch=args.batch)
    gen, variables = bench.init_serving_variables(gen, img, uv, reg)

    @jax.jit
    def fwd(v, i, u, r):
        _, rgb, _, dif = gen.apply(v, i, u, r)
        return jnp.mean(rgb) + jnp.mean(dif)

    print("warmup:", float(fwd(variables, img, uv, reg)))

    with jax.profiler.trace(args.out):
        acc = 0.0
        for t in range(args.iters):
            acc += float(fwd(variables, img + jnp.float32(t * 1e-6), uv, reg))
    print("traced", args.iters, "forwards; acc", acc)

    agg, cnt, module_total = parse_device_events(args.out)
    print(f"\ntotal device time {module_total/1e3:.1f} ms over {args.iters} "
          f"fwd x batch {args.batch} = "
          f"{module_total/args.iters/args.batch:.1f} us/face")
    print_top(agg, cnt, module_total, top=args.top)


if __name__ == "__main__":
    main()
