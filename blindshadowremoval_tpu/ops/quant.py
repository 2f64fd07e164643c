"""Int8 quantized convolution for serving.

Measured motivation (v5e, batch 128, 256x256): int8 is *slower* than bf16
for the model's ordinary convs (21 vs 16 us/face for the stride-2 encoder
conv) but 2x faster for the MXU-pathological small-output-channel head
(7x7 x 64 -> 2: 44 vs 84 us/face — the single most expensive op in the
generator).  So quantization here is surgical: only the output head runs
int8, opt-in (`int8_head=True` on the generators), everything else stays in
the module dtype.  Re-measured with STATIC scales (which fuse the quantize
pass away, tools/bench_int8_decoder.py): still slower for ordinary convs —
up3 ConvT 72.8 vs 65.9 us/face, conv1 12.5 vs 10.4 — the v5e MXU runs bf16
at full rate, so int8 buys nothing outside the lane-starved head.

Scheme: symmetric int8, per-output-channel weight scales, and one of three
activation-scale modes (the quantize pass fuses into the producer's epilogue
under XLA; accumulation is int32 on the MXU):

  * dynamic per-sample (max-abs over H/W/C) — no calibration, but the
    data-dependent max costs a full extra bandwidth pass;
  * static scalar (calibrated bound) — the quantize is pure-elementwise and
    fuses away;
  * static PER-INPUT-CHANNEL (a tuple of calibrated per-channel bounds) —
    same fusion behavior, but channels with small dynamic range stop wasting
    int8 codes on the largest channel's bound.  The per-channel scales are
    folded into the weight before weight quantization (out_o = sum_kc
    xq[k,c] * s_c*w[k,c,o] = (sum xq wq) * t_o), so the MXU still sees a
    plain int8 x int8 conv.  Per-channel bounds are derived from the
    checkpoint's own BatchNorm statistics (`head_input_bounds` in
    ops/calibration.py) — no calibration data needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[kh,kw,in,out] float kernel -> (int8 kernel, [out] float scales)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def int8_conv(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
              stride: int = 1, padding: str = "SAME",
              static_scale: float | tuple = 0.0) -> jax.Array:
    """Dynamically quantized NHWC conv: int8 x int8 -> int32 on the MXU,
    dequantized to float32.  `w` is the float kernel (quantized per call —
    it is tiny next to the activations); `x` any float dtype.

    `static_scale > 0` uses a fixed (calibrated) activation scale of
    static_scale/127 instead of the dynamic per-sample max.  The dynamic
    max is a data-dependent reduction over the whole activation, which
    forces the quantize into its own full-bandwidth pass (measured 2.4 ms
    per 128-batch at the 256^2 x 64 head input, ~18 us/face); a static
    scale makes quantization pure-elementwise, so XLA fuses it into the
    producing fusion's epilogue and the pass disappears.  Values beyond
    the calibrated range saturate at +-127 (standard int8 serving
    semantics).

    `static_scale` may also be a TUPLE of per-input-channel bounds
    (len == x.shape[-1]): each channel quantizes against its own bound, and
    the bounds are folded into the weight before its own quantization so
    the conv itself is unchanged.  Caveat, measured in tests/test_quant.py:
    folding makes every channel's xq full-scale, so the per-output-channel
    weight grid (set by the largest folded tap) multiplies large codes for
    ALL taps — the activation-side win is partly repaid as weight-side
    error, and with channel-independent weights the two nearly cancel.
    Kept as a calibration option; the scalar bound is the production head
    configuration (docs/perf.md).

    Differentiable via a straight-through estimator: the backward pass is
    the exact float-conv gradient (round/clip/int-cast would otherwise kill
    the tangent almost everywhere), so the op is safe under training /
    quantization-aware fine-tuning, not just inference."""
    xf = x.astype(jnp.float32)
    w = w.astype(jnp.float32)
    if isinstance(static_scale, tuple):
        if len(static_scale) != x.shape[-1]:
            raise ValueError(
                f"per-channel static_scale has {len(static_scale)} entries "
                f"for {x.shape[-1]} input channels")
        bounds = jnp.asarray(static_scale, jnp.float32)
        x_scale = bounds / 127.0 + 1e-12          # [cin]
        xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        # fold the per-channel activation scales into the kernel; the
        # per-output-channel weight quantization then absorbs them exactly
        wq, w_scale = quantize_weight(w * x_scale[None, None, :, None])
        out_scale = w_scale
    else:
        if static_scale > 0.0:
            x_scale = jnp.asarray(static_scale / 127.0, jnp.float32)
        else:   # <= 0: dynamic per-sample max
            x_scale = jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                              keepdims=True) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        wq, w_scale = quantize_weight(w)
        out_scale = x_scale * w_scale

    dn = jax.lax.conv_dimension_numbers(
        xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * out_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _float_conv(x, w, bias, stride, padding):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (stride, stride),
        padding, dimension_numbers=dn)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _int8_conv_fwd(x, w, bias, stride, padding, static_scale):
    return int8_conv(x, w, bias, stride, padding, static_scale), (x, w, bias)


def _int8_conv_bwd(stride, padding, static_scale, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _float_conv(x_, w_, b_, stride,
                                                    padding), x, w, bias)
    dx, dw, db = vjp(g)
    return dx, dw, (None if bias is None else db)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)
