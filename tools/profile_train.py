"""Capture a device profile of the fused G+D training step and print the
top fusions by device time.

Same trace mechanics as tools/profile_infer.py (jax.profiler works through
the axon tunnel).  The step profiled is the production
`Trainer.train_step` — on-device augmentation, generator + 3
discriminators + VGG forward, full loss stack, both Adam updates — at the
given batch size / dtype / remat configuration.

Usage: python tools/profile_train.py [--batch 8] [--iters 4] [--remat]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--vgg-dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/train_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.train.trainer import Trainer

    s = 256
    cfg = get_config("train", img_size=s, batch_size=args.batch,
                     compute_dtype=args.compute_dtype,
                     vgg_dtype=args.vgg_dtype, remat=args.remat)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b2 = args.batch * 2
    batch = {
        "img_dark": rng.uniform(size=(b2, s, s, 3)),
        "gt": rng.uniform(size=(b2, s, s, 3)),
        "mask": rng.uniform(size=(b2, s, s, 1)),
        "uv": rng.uniform(size=(b2, s, s, 3)),
        "reg": rng.uniform(-0.02, 0.02, size=(b2, s, s, 6)),
        "face": (rng.uniform(size=(b2, s, s, 1)) > 0.4),
    }
    batch = {k: jnp.asarray(v.astype(np.float32)) for k, v in batch.items()}

    raw_step = type(trainer).train_step.__wrapped__

    # batch as an argument, not a closure capture: jit embeds closed-over
    # device arrays as HLO constants, bloating the remote compile request
    # by the whole batch size (docs/perf.md)
    @jax.jit
    def step(state, key, batch):
        new_state, losses, _ = raw_step(trainer, state, batch, key,
                                        train=True)
        return new_state, losses["recon_c"]

    print("compiling (remote; minutes through the tunnel)...", flush=True)
    state, l0 = step(state, jax.random.PRNGKey(1), batch)
    print("warmup loss:", float(l0), flush=True)

    with jax.profiler.trace(args.out):
        acc = 0.0
        for t in range(args.iters):
            state, l = step(state, jax.random.PRNGKey(2 + t), batch)
            acc += float(l)
    print(f"traced {args.iters} steps; acc {acc}", flush=True)

    agg, cnt, module_total = parse_device_events(args.out)
    per_view_us = module_total / (args.iters * b2)
    print(f"\nbatch {args.batch} (x2 views), remat={args.remat}: "
          f"{module_total/args.iters/1e3:.1f} ms/step, "
          f"{per_view_us:.0f} us/view")
    print_top(agg, cnt, module_total, top=args.top)


if __name__ == "__main__":
    main()
