"""Training-step throughput on one TPU chip.

Times the fused G+D train step (`Trainer.train_step`: on-device augmentation,
generator + 3 discriminators + VGG-19 forward, full loss stack, both Adam
updates) at 256x256 across batch sizes and dtype configs.

Timing uses the same axon-tunnel-safe pattern as bench.py: K steps chained
inside one `lax.scan` reduced through the carried TrainState, timed around a
final scalar fetch (one tunnel roundtrip amortized over K full steps).
`jax.block_until_ready` does NOT wait for remote execution through the
tunnel; only a device->host fetch does.

Usage: python tools/bench_train.py [--batches 1,8,32] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np



def bench_config(batch_size: int, steps: int, compute_dtype: str,
                 vgg_dtype: str, donate: bool = True,
                 remat: bool = False, s2d: bool = False,
                 compiler_options: dict | None = None) -> dict:
    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.train.trainer import Trainer

    s = 256
    cfg = get_config("train", img_size=s, batch_size=batch_size,
                     compute_dtype=compute_dtype, vgg_dtype=vgg_dtype,
                     remat=remat, s2d_convs=s2d)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b2 = batch_size * 2
    batch = {
        "img_dark": rng.uniform(size=(b2, s, s, 3)),
        "gt": rng.uniform(size=(b2, s, s, 3)),
        "mask": rng.uniform(size=(b2, s, s, 1)),
        "uv": rng.uniform(size=(b2, s, s, 3)),
        "reg": rng.uniform(-0.02, 0.02, size=(b2, s, s, 6)),
        "face": (rng.uniform(size=(b2, s, s, 1)) > 0.4),
    }
    batch = {k: jnp.asarray(v.astype(np.float32)) for k, v in batch.items()}

    # raw (unjitted) step body so K steps chain inside one executable
    raw_step = type(trainer).train_step.__wrapped__

    # batch must be an ARGUMENT, not a closure capture: jit embeds
    # closed-over device arrays as HLO constants, so the remote compile
    # request would carry the whole batch as literals (~285 MB at batch 32,
    # the 2.5-10 min compiles; HTTP 413 at batch 64 — docs/perf.md)
    def body_with(batch):
        def body(carry, i):
            state, key = carry
            key, sub = jax.random.split(key)
            new_state, losses, _ = raw_step(trainer, state, batch, sub,
                                            train=True)
            return (new_state, key), losses["recon_c"]
        return body

    def run_fn(state, key, batch):
        (state, _), ls = jax.lax.scan(
            body_with(batch), (state, key), jnp.arange(steps))
        return state, ls.sum()

    # AOT-compile so the same executable also reports its XLA cost analysis
    # (one remote compile; jit would cache-miss a separate lower().compile())
    # and can take per-run XLA compiler options (XLA_FLAGS with TPU-only
    # flags die client-side in this environment; PJRT compiler_options
    # propagate to the server-side compile)
    run = (jax.jit(run_fn, donate_argnums=(0,) if donate else ())
           .lower(state, jax.random.PRNGKey(1), batch)
           .compile(compiler_options=compiler_options or None))

    # XLA's own FLOP count -> model FLOP utilization against the v5e bf16
    # peak (197 TFLOP/s).  Verified empirically (2026-08-17): the HLO cost
    # analysis counts a while/scan body ONCE, not x trip count — so the
    # K-step scanned program's "flops" is the per-step figure directly
    # (cross-checked: one plain conv reports its analytic FLOPs exactly,
    # and the scanned step reports ~3.07 TFLOP ~= the analytic single-step
    # estimate, not 20x it).
    step_flops = None
    try:
        ca = run.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and ca.get("flops"):
            step_flops = float(ca["flops"])
    except Exception:
        pass

    # warmup (one execution), fetch to force completion
    state1, tot = run(state, jax.random.PRNGKey(1), batch)
    w = float(tot)
    t0 = time.time()
    _, tot2 = run(state1, jax.random.PRNGKey(2), batch)
    v = float(tot2)
    dt = time.time() - t0
    assert np.isfinite(v) and v != w, (v, w)
    step_time = dt / steps
    out = {
        "batch_size": batch_size,
        "views_per_step": b2,
        "compute_dtype": compute_dtype,
        "vgg_dtype": vgg_dtype,
        "remat": remat,
        "s2d": s2d,
        "step_time_ms": round(step_time * 1e3, 2),
        "steps_per_sec": round(1.0 / step_time, 2),
        "views_per_sec": round(b2 / step_time, 1),
    }
    if step_flops:
        out["step_tflops"] = round(step_flops / 1e12, 3)
        out["mfu_pct_vs_bf16_peak"] = round(
            100.0 * step_flops / step_time / 197e12, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--vgg-dtype", default="float32")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize bottleneck blocks (fits batch 32+ "
                         "in 16 GB HBM)")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth form for the lane-starved 7x7 "
                         "convs (conv1 + head) — numerically identical; "
                         "the fwd+bwd micro-bench measured it 13%% faster "
                         "on the tail segment (bench_packed_tail --grad)")
    ap.add_argument("--compiler-options", default="",
                    help="comma-separated k=v XLA compiler options for the "
                         "server-side compile, e.g. "
                         "xla_tpu_scoped_vmem_limit_kib=65536")
    args = ap.parse_args()
    opts = dict(kv.split("=", 1)
                for kv in args.compiler_options.split(",") if kv)
    for b in [int(x) for x in args.batches.split(",")]:
        r = bench_config(b, args.steps, args.compute_dtype, args.vgg_dtype,
                         donate=not args.no_donate, remat=args.remat,
                         s2d=args.s2d, compiler_options=opts)
        if opts:
            r["compiler_options"] = opts
        print(json.dumps(r))


if __name__ == "__main__":
    main()
