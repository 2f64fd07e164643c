"""Micro-bench the generator's 256^2 tail: ConvT(up3) + BN + leaky + 7x7
head, direct vs phase-packed (ops/packed.py), bf16 and int8-static head.

The packed form computes the whole segment at 128^2 with 4x the channels:
the ConvT's four output phases stay as channel groups (its natural product)
and the 7x7x64->2 head becomes a 5x5x256->8 conv — 8 instead of 2 of the
MXU's 128 output lanes, and no 256^2 tensor is ever materialized.

--grad benches the BACKWARD through the same segment (value_and_grad wrt
the conv kernels + the segment input, like the train step sees): the
round-2 profile blamed the head's lane-starved weight gradient for ~2.3 ms
of the train step, and only the forward forms had been measured
(docs/perf.md "Training step").  Adds an s2d-head variant
(models/blocks.py:space_to_depth_conv) alongside direct and packed.

Usage: python tools/bench_packed_tail.py [--batch 128] [--iters 40] [--grad]
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
    ap.add_argument("--grad", action="store_true",
                    help="bench the backward (value_and_grad wrt kernels + "
                         "input) instead of the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from blindshadowremoval_tpu.ops.packed import (
        conv_same_packed, conv_same_packed_kernel, convt_packed,
        convt_packed_kernel, tile_phase, unpack_image)

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
    SCALE = 8.0  # static int8 activation bound for the bench

    def direct(x, dtype, int8):
        y = lax.conv_transpose(x.astype(dtype), wt.astype(dtype), (2, 2),
                               "SAME",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bt.astype(dtype)
        y = y * scale.astype(dtype) + shift.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        if int8:
            from blindshadowremoval_tpu.ops.quant import int8_conv
            out = int8_conv(y, wh, bh, 1, "SAME", SCALE)
        else:
            out = lax.conv_general_dilated(
                y, wh.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bh.astype(dtype)
        return out.astype(jnp.float32)

    wt_p = convt_packed_kernel(wt)
    wh_p = conv_same_packed_kernel(wh)
    bt_p, scale_p, shift_p = (tile_phase(v) for v in (bt, scale, shift))
    bh_p = tile_phase(bh)

    def packed(x, dtype, int8):
        y = convt_packed(x.astype(dtype), wt_p.astype(dtype))
        y = y + bt_p.astype(dtype)
        y = y * scale_p.astype(dtype) + shift_p.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        if int8:
            xs = jnp.asarray(SCALE / 127.0, jnp.float32)
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) / xs),
                          -127, 127).astype(jnp.int8)
            ws = jnp.max(jnp.abs(wh_p), axis=(0, 1, 2)) / 127.0 + 1e-12
            wq = jnp.clip(jnp.round(wh_p / ws), -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                yq, wq, (1, 1), ((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (xs * ws) + bh_p
        else:
            out = conv_same_packed(y, wh_p.astype(dtype)) + bh_p.astype(dtype)
        return unpack_image(out.astype(jnp.float32), 2)

    # correctness (f32)
    ref = direct(x[:2], jnp.float32, False)
    got = packed(x[:2], jnp.float32, False)
    err = float(jnp.abs(ref - got).max())
    print(f"packed-vs-direct f32 max err: {err:.2e}")
    assert err < 1e-3

    def bench(fn, name):
        @jax.jit
        def run(x):
            def body(c, t):
                o = fn(x + t.astype(jnp.float32) * 1e-6)
                return c + jnp.mean(o), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
            return acc

        prev = float(run(x))  # warmup
        best = float("inf")
        for tr in range(1, 4):
            t0 = time.perf_counter()
            val = float(run(x + jnp.float32(tr * 1e-5)))
            dt = time.perf_counter() - t0
            assert val != prev
            prev = val
            best = min(best, dt)
        us = best / args.iters / args.batch * 1e6
        print(f"{name:24s} {us:8.2f} us/face")
        return us

    from blindshadowremoval_tpu.models.blocks import space_to_depth_conv

    def direct_s2d_head(x, dtype):
        y = lax.conv_transpose(x.astype(dtype), wt.astype(dtype), (2, 2),
                               "SAME",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bt.astype(dtype)
        y = y * scale.astype(dtype) + shift.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        return space_to_depth_conv(y, wh, bh, dtype).astype(jnp.float32)

    if not args.grad:
        bench(lambda x: direct(x, jnp.bfloat16, False), "direct bf16")
        bench(lambda x: direct(x, jnp.bfloat16, True), "direct bf16+int8head")
        bench(lambda x: direct_s2d_head(x, jnp.bfloat16), "s2d-head bf16")
        bench(lambda x: packed(x, jnp.bfloat16, False), "packed bf16")
        bench(lambda x: packed(x, jnp.bfloat16, True), "packed bf16+int8head")
        return

    # ---- backward: d(loss)/d(kernels, input) through each form ----------
    # Kernel packing runs INSIDE the traced function (packed kernels are
    # derived values, like a train step quantizing/packing per step); the
    # pack transforms are O(k^2 cin cout) — noise next to the convs.
    def seg_direct(p, x, dtype):
        return direct_with(x, p["wt"], p["wh"], dtype)

    def direct_with(x, wt_, wh_, dtype):
        y = lax.conv_transpose(x.astype(dtype), wt_.astype(dtype), (2, 2),
                               "SAME",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bt.astype(dtype)
        y = y * scale.astype(dtype) + shift.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        out = lax.conv_general_dilated(
            y, wh_.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bh.astype(dtype)
        return out.astype(jnp.float32)

    def seg_s2d_head(p, x, dtype):
        y = lax.conv_transpose(x.astype(dtype), p["wt"].astype(dtype),
                               (2, 2), "SAME",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bt.astype(dtype)
        y = y * scale.astype(dtype) + shift.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        out = space_to_depth_conv(y, p["wh"], bh, dtype)
        return out.astype(jnp.float32)

    def seg_packed(p, x, dtype):
        wt_p_ = convt_packed_kernel(p["wt"]).astype(dtype)
        wh_p_ = conv_same_packed_kernel(p["wh"]).astype(dtype)
        y = convt_packed(x.astype(dtype), wt_p_)
        y = y + bt_p.astype(dtype)
        y = y * scale_p.astype(dtype) + shift_p.astype(dtype)
        y = jnp.where(y >= 0, y, 0.3 * y)
        out = conv_same_packed(y, wh_p_) + bh_p.astype(dtype)
        return unpack_image(out.astype(jnp.float32), 2)

    params = {"wt": wt, "wh": wh}

    def bench_grad(seg, name, dtype=jnp.bfloat16):
        def loss(p, x):
            o = seg(p, x, dtype)
            return jnp.mean(o * o)

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(c, t):
                v, (gp, gx) = vg(p, x + t.astype(jnp.float32) * 1e-6)
                return (c + v + jnp.mean(gp["wh"].astype(jnp.float32))
                        + jnp.mean(gx.astype(jnp.float32)) * 1e-3), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
            return acc

        prev = float(run(params, x))
        best = float("inf")
        for tr in range(1, 4):
            t0 = time.perf_counter()
            val = float(run(params, x + jnp.float32(tr * 1e-5)))
            dt = time.perf_counter() - t0
            assert val != prev
            prev = val
            best = min(best, dt)
        us = best / args.iters / args.batch * 1e6
        print(f"{name:24s} {us:8.2f} us/face (fwd+bwd)")
        return us

    # correctness: the three forms agree in f32, gradients included
    v0, g0 = jax.value_and_grad(
        lambda p: jnp.mean(seg_direct(p, x[:2], jnp.float32) ** 2))(params)
    for seg, nm in ((seg_s2d_head, "s2d"), (seg_packed, "packed")):
        v1, g1 = jax.value_and_grad(
            lambda p: jnp.mean(seg(p, x[:2], jnp.float32) ** 2))(params)
        dv = abs(float(v0 - v1))
        dg = float(jnp.abs(g0["wh"] - g1["wh"]).max())
        print(f"{nm} grad-vs-direct: dloss {dv:.2e}, dgrad(wh) {dg:.2e}")
        assert dv < 1e-5 and dg < 1e-4

    bench_grad(seg_direct, "direct bf16")
    bench_grad(seg_s2d_head, "s2d-head bf16")
    bench_grad(seg_packed, "packed bf16")


if __name__ == "__main__":
    main()
