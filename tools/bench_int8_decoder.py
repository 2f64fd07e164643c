"""Micro-bench: does STATIC-scale int8 now pay for ordinary convs?

Round-1 measured int8 SLOWER than bf16 for the model's ordinary convs
(ops/quant.py docstring: 21 vs 16 us/face for the stride-2 encoder conv) —
but that measurement used the DYNAMIC per-sample activation max, whose
reduction forces a separate full-bandwidth quantize pass.  The calibrated
static scale removed that pass for the head (+10.6% e2e); this tool asks
whether static int8 also wins for the bandwidth-bound decoder ConvT and
the encoder conv, before building an `int8_decoder` feature.

Segments measured (batch 128, shapes of the 256^2 generator):
  * up3 tail: ConvT 3x3 128->64 s2 (128^2 -> 256^2) + BN + leaky + 7x7
    64->2 head — bf16 vs int8-static ConvT, int8-static head in both.
  * encoder conv1: 7x7 3->32 s2 at 256^2 — bf16 vs int8-static.

Usage: python tools/bench_int8_decoder.py [--batch 128] [--iters 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from blindshadowremoval_tpu.ops.quant import int8_conv, quantize_weight

    B, H, CIN, CMID = args.batch, 128, 128, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, CIN)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, CIN, CMID)) * 0.05
                      ).astype(np.float32))
    bt = jnp.asarray(rng.normal(size=(CMID,)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, CMID).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(CMID,)).astype(np.float32) * 0.1)
    wh = jnp.asarray((rng.normal(size=(7, 7, CMID, 2)) * 0.05
                      ).astype(np.float32))
    bh = jnp.asarray(rng.normal(size=(2,)).astype(np.float32) * 0.1)
    XS = 8.0   # static activation bound for the bench inputs
    HS = 8.0

    wt_q, wt_s = quantize_weight(wt)     # [3,3,128,64] int8, [64] scales

    def tail(x, convt_int8):
        if convt_int8:
            xs = jnp.asarray(XS / 127.0, jnp.float32)
            xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
            acc = lax.conv_transpose(
                xq, wt_q, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (xs * wt_s) + bt
            y = y.astype(jnp.bfloat16)
        else:
            y = lax.conv_transpose(
                x.astype(jnp.bfloat16), wt.astype(jnp.bfloat16), (2, 2),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bt.astype(jnp.bfloat16)
        y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
        y = jnp.where(y >= 0, y, jnp.asarray(0.3, y.dtype) * y)
        return int8_conv(y, wh, bh, 1, "SAME", HS).astype(jnp.float32)

    img = jnp.asarray(rng.uniform(size=(B, 256, 256, 3)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(7, 7, 3, 32)) * 0.05
                      ).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)

    def enc(img, use_int8):
        if use_int8:
            out = int8_conv(img, w1, b1, 2, "SAME", 1.0)   # inputs in [0,1]
        else:
            out = lax.conv_general_dilated(
                img.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), (2, 2),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = out + b1.astype(jnp.bfloat16)
        return out.astype(jnp.float32)

    # numerics sanity: int8-static tail within quantization error of bf16
    ref = tail(x[:2], False)
    got = tail(x[:2], True)
    rel = float(jnp.abs(ref - got).max() / (jnp.abs(ref).max() + 1e-6))
    print(f"tail int8-vs-bf16 rel err: {rel:.3f} (quantization-scale noise)")

    def bench(fn, inp, name):
        @jax.jit
        def run(v):
            def body(c, t):
                o = fn(v + t.astype(jnp.float32) * 1e-6)
                return c + jnp.mean(o), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
            return acc

        prev = float(run(inp))
        best = float("inf")
        for tr in range(1, 4):
            t0 = time.perf_counter()
            val = float(run(inp + jnp.float32(tr * 1e-5)))
            dt = time.perf_counter() - t0
            assert val != prev
            prev = val
            best = min(best, dt)
        us = best / args.iters / args.batch * 1e6
        print(f"{name:32s} {us:8.2f} us/face")
        return us

    bench(lambda v: tail(v, False), x, "up3 bf16 + int8s head")
    bench(lambda v: tail(v, True), x, "up3 int8s + int8s head")
    bench(lambda v: enc(v, False), img, "conv1 bf16")
    bench(lambda v: enc(v, True), img, "conv1 int8s")


if __name__ == "__main__":
    main()
