"""Roofline analysis of the headline inference forward.

Lowers the exact bench.py forward AOT, reads XLA's compiled cost analysis
(flops + bytes accessed after fusion), and compares the measured step time
against the two speed-of-light bounds on the target chip:

    t_compute   = flops / peak_flops          (MXU bound)
    t_bandwidth = bytes / peak_hbm_bandwidth  (HBM bound)
    speed_of_light = max(t_compute, t_bandwidth)

The headline model is small (tens of GFLOP per face) and elementwise-heavy
at 256², so the interesting question is which wall it sits against and how
far from it.  Peaks default to TPU v5e (bf16 394 TFLOP/s, HBM 819 GB/s) —
override with --peak-tflops / --peak-gbps for other chips.

Usage: python tools/roofline_infer.py [--batch 128] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--peak-tflops", type=float, default=394.0,
                    help="chip peak bf16 TFLOP/s (v5e: 394)")
    ap.add_argument("--peak-gbps", type=float, default=819.0,
                    help="chip peak HBM GB/s (v5e: 819)")
    ap.add_argument("--no-int8-head", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.generator import GSCGenerator

    s = 256
    gen = GSCGenerator(dtype=jnp.bfloat16,
                       int8_head=not args.no_int8_head,
                       int8_head_scale=18.29)
    rng = np.random.default_rng(0)
    b = args.batch
    img = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(b, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(b, s, s, 6)).astype(np.float32))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), img[:1], uv[:1],
                                  reg[:1])

    def fwd(v, i, u, r):
        _, rgb, _, dif = gen.apply(v, i, u, r)
        return jnp.mean(rgb) + jnp.mean(dif)

    lowered = jax.jit(fwd).lower(variables, img, uv, reg)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    # timed with the tunnel-safe pattern (bench.py): scan K iterations inside
    # one jitted call, fetch a scalar that depends on every step
    K = args.iters

    @jax.jit
    def run(v, i, u, r):
        def body(carry, _):
            return carry + fwd(v, i + carry * 1e-9, u, r) * 1e-9, ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    first = float(run(variables, img, uv, reg))      # compile + warm
    t0 = time.perf_counter()
    second = float(run(variables, img, uv, reg))
    wall = time.perf_counter() - t0
    assert second != 0.0 and np.isfinite(second), (first, second)
    step_s = wall / K

    t_compute = flops / (args.peak_tflops * 1e12)
    t_bandwidth = byts / (args.peak_gbps * 1e9)
    sol = max(t_compute, t_bandwidth)
    print(json.dumps({
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
