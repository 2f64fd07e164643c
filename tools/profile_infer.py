"""Capture a device profile of the headline inference forward and print the
top fusions by device time.

jax.profiler traces work through the axon tunnel (docs/perf.md); this is
the tool that found the jnp.choose gather hotspot in round 1.

Usage: python tools/profile_infer.py [--batch 128] [--iters 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/infer_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.generator import GSCGenerator

    s = 256
    gen = GSCGenerator(dtype=jnp.bfloat16, int8_head=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(args.batch, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(args.batch, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(args.batch, s, s, 6)).astype(np.float32))
    # init at batch 1: params are batch-independent and the batch-128 init
    # compile is minutes of (high-variance) remote compile time
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), img[:1], uv[:1],
                                  reg[:1])

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

    # parse the trace: aggregate device-side events by name
    files = sorted(glob.glob(args.out + "/**/*.trace.json.gz", recursive=True))
    assert files, f"no trace under {args.out}"
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process names mention TPU/device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            cnt[name] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    print(f"\ntotal device time {total/1e3:.1f} ms over {args.iters} fwd "
          f"x batch {args.batch} = {total/args.iters/args.batch:.1f} us/face")
    for name, dur in rows:
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  x{cnt[name]:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
