"""Phase-packed (2x2 space-to-depth) forms of the decoder's convolutions.

STATUS: measured NEGATIVE result, kept as a tested utility + record so the
idea is not re-tried (docs/perf.md "packed decoder tail").  Hypothesis: at
256x256 the generator's tail tops the inference profile — the 7x7 output
head has 2 output channels (2 of 128 MXU lanes; 34.7 us/face as int8), and
each ConvTranspose's natural product is already phase-packed, so computing
the whole tail packed at 128^2 should quadruple head lane utilization and
skip the 256^2 materialization.  Measured on v5e (tools/bench_packed_tail.py,
batch 128): packed bf16 212 us/face vs direct bf16 115; packed int8-static
63.75 vs direct int8-static 63.87 — XLA's own transposed-conv lowering and
layout assignment beat the manual packing, same lesson as the s2d_convs and
concatenated-NonLocal experiments.  The direct int8-static head stays the
production configuration.

The rewrites themselves are exact and tested (tests/test_packed.py):
a stride-2 ConvTranspose maps onto a small conv whose output keeps the four
output phases (p,q) in {0,1}^2 as channel groups at the INPUT resolution,
and any SAME odd-k conv over the full-resolution image maps onto a conv
over that packed layout.

Packed layout convention ("phase-aligned"): channel index (p*2+q)*C + c
holds pixel [2i+p, 2j+q, c] — i.e. `unpack_image` below is
`blocks.d2s_unpack`.  (Note: this differs from `blocks.s2d_pack`, which
packs a *padded* image for its own kernel transform.)

Reference parity: these are exact linear-algebra rewrites of
`nn.ConvTranspose(..., padding="SAME")` / SAME convs — same parameters,
same math, different operand shapes; tests/test_packed.py asserts
f32 equality to float tolerance against the direct path.

Derivations (1-D; 2-D is the tensor product):

ConvTranspose k=3 s=2 SAME == input-dilated conv with pad (2, 1)
(probed numerically; jax.lax.conv_transpose applies the kernel unflipped).
With x_dil[2t] = x[t]:  out[2i+p] = sum_m x_dil[2i+p+m-2] w[m], so
  p=0: out[2i]   = x[i-1] w[0] + x[i] w[2]
  p=1: out[2i+1] = x[i]   w[1]
i.e. one 2-tap conv per phase over xp = pad_low(x, 1):
  packed_kernel[a, p] = w[m] iff tap a in {0,1} reads xp[i+a] = x[i-1+a].

SAME odd-k conv on the packed layout: out[2i+p] = sum_u x[2i+p+u] w[u+r]
(r = k//2); writing 2i+p+u = 2(i+d)+s maps each (p, s) phase pair to taps
d = (u+p-s)/2 with u = 2d+s-p, giving symmetric support
d in [-(r+1)//2, (r+1)//2] — an odd 2*((r+1)//2)+1-tap packed kernel
(5 for k=7, 3 for k in {3,5}) with structural zeros where u falls outside
[-r, r] or has the wrong parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax import lax


def pack_image(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C] phase-aligned (inverse of unpack_image)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    y = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def unpack_image(y: jax.Array, cout: int) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C] (same layout as blocks.d2s_unpack)."""
    b, h, w, _ = y.shape
    x = y.reshape(b, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, cout)


def convt_packed_kernel(w: jax.Array) -> jax.Array:
    """[3,3,cin,cout] ConvTranspose(s=2, SAME) kernel -> [2,2,cin,4cout]
    packed-conv kernel (apply with `convt_packed`)."""
    k = w.shape[0]
    assert w.shape[:2] == (3, 3), f"stride-2 SAME packed form needs k=3, got {k}"
    cin, cout = w.shape[2], w.shape[3]
    # tap a, phase p: m(a=0,p=0)=w[0]; m(a=1,p=0)=w[2]; m(a=1,p=1)=w[1]
    z = jnp.zeros_like(w[0, 0])          # [cin, cout]
    rows = {(0, 0): 0, (1, 0): 2, (1, 1): 1}

    def sub(a, p, b_, q):
        if (a, p) in rows and (b_, q) in rows:
            return w[rows[(a, p)], rows[(b_, q)]]
        return z

    # packed[a, b, cin, (p*2+q)*cout + co]
    packed = jnp.stack([
        jnp.stack([
            jnp.concatenate([sub(a, p, b_, q) for p in (0, 1) for q in (0, 1)],
                            axis=-1)
            for b_ in (0, 1)], axis=0)
        for a in (0, 1)], axis=0)
    return packed.reshape(2, 2, cin, 4 * cout)


def convt_packed(x: jax.Array, packed_kernel: jax.Array) -> jax.Array:
    """[B,H,W,cin] x packed kernel -> [B,H,W,4cout] phase-packed ConvT
    output (== pack_image(conv_transpose(x, w, (2,2), 'SAME')))."""
    return lax.conv_general_dilated(
        x, packed_kernel, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def conv_same_packed_kernel(w: jax.Array) -> jax.Array:
    """[k,k,cin,cout] SAME stride-1 odd-k kernel -> [K,K,4cin,4cout]
    packed-conv kernel over the phase-aligned layout, K = 2*((k//2+1)//2)+1."""
    k, _, cin, cout = w.shape
    assert k % 2 == 1
    r = k // 2
    kk = 2 * ((r + 1) // 2) + 1
    # u = 2d + s - p; valid iff -r <= u <= r
    d = jnp.arange(kk) - kk // 2                                   # packed tap
    ps = jnp.arange(2)
    # index grid [d, s, p] -> u + r (clipped), validity mask
    u = 2 * d[:, None, None] + ps[None, :, None] - ps[None, None, :]
    valid = (jnp.abs(u) <= r)
    ui = jnp.clip(u + r, 0, k - 1)
    # w1[d, s, p, l, ci, co] = w[u+r, l] masked
    w1 = w[ui] * valid[..., None, None, None].astype(w.dtype)
    w2 = w1[:, :, :, ui] * valid[None, None, None, ...,
                                 None, None].astype(w.dtype)
    # [d, s, p, e, t, q, ci, co] -> [d, e, (s,t,ci), (p,q,co)]
    return w2.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        kk, kk, 4 * cin, 4 * cout)


def conv_same_packed(xp: jax.Array, packed_kernel: jax.Array) -> jax.Array:
    """Packed [B,H,W,4cin] x packed kernel [K,K,4cin,4cout] ->
    packed [B,H,W,4cout]; equals pack_image(SAME conv of the unpacked
    image).  K is odd with symmetric support, so padding is SAME."""
    kk = packed_kernel.shape[0]
    lo = kk // 2
    return lax.conv_general_dilated(
        xp, packed_kernel, (1, 1), ((lo, lo), (lo, lo)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype)


def conv1x1_packed(xp: jax.Array, w: jax.Array) -> jax.Array:
    """Packed [B,H,W,4cin] x [1,1,cin,cout] -> packed [B,H,W,4cout]:
    a 1x1 conv acts per-phase, i.e. a block-diagonal (grouped) matmul."""
    cin, cout = w.shape[2], w.shape[3]
    wg = jnp.concatenate([w[0, 0]] * 4, axis=1)  # grouped kernel [cin, 4cout]
    return lax.conv_general_dilated(
        xp, wg[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4,
        preferred_element_type=xp.dtype)


def tile_phase(v: jax.Array) -> jax.Array:
    """Per-channel vector [C] -> packed-channel vector [4C]."""
    return jnp.tile(v, 4)


def concat_packed(a: jax.Array, ca: int, b: jax.Array, cb: int) -> jax.Array:
    """Channel-concat two packed tensors: packed channels interleave as
    (phase, channel), so the concat happens inside each phase group."""
    sa, sb = a.shape[:-1], b.shape[:-1]
    assert sa == sb, (sa, sb)
    ar = a.reshape(*sa, 4, ca)
    br = b.reshape(*sb, 4, cb)
    return jnp.concatenate([ar, br], axis=-1).reshape(*sa, 4 * (ca + cb))
