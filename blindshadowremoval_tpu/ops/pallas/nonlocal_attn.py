"""Fused embedded-Gaussian attention kernel for the NonLocal blocks.

The generator's six NonLocal blocks each compute, at the 32x32 bottleneck,
  out = softmax(theta @ phi^T) @ g          (model.py:51-53 in the reference)
with N = 1024 positions and D = 128 channels.  Unfused, the N x N attention
matrix round-trips HBM twice per block (8 MB f32 per image per block — the
dominant HBM traffic of the whole model, which profiling shows is
memory-bound).  This Pallas kernel keeps scores, softmax, and the weighted
sum entirely in VMEM: one grid program per batch element, one HBM read of
theta/phi/g and one write of out.

N = 1024 and D = 128 are exact multiples of the MXU/VPU tiles, so the two
matmuls run dense on the MXU with an f32 VPU softmax in between
(~4 MB VMEM for the score tile, well under the 16 MB budget).

Autodiff: both directions are fused.  The backward kernel recomputes the
softmax weights in VMEM (flash-style — recomputing an MXU matmul is cheaper
than round-tripping the 4 MB N x N weight matrix through HBM) and evaluates
all four gradient matmuls (dW, dg, dtheta, dphi) without materializing any
N x N intermediate off-chip; unfused XLA spills W, dW, and dS to HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only with a TPU-capable jaxlib; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _use_pallas(n: int, d: int, interpret: bool) -> bool:
    """One dispatch predicate shared by forward and backward so the two
    directions can never route to different kernels."""
    # Mosaic cannot lower HIGH/HIGHEST dot precision; when the caller asks
    # for a non-default ambient matmul precision (the quality-strict f32
    # serving/parity configurations, tools/parity_serving.py), route to the
    # XLA einsum path, which honors it
    prec = jax.config.jax_default_matmul_precision
    if prec is not None and str(prec).lower() != "default":
        return False
    aligned = (n % 128 == 0) and (d % 128 == 0)
    # the EFFECTIVE target platform: a `jax.default_device(cpu)` scope on a
    # TPU-attached process (e.g. host-side Trainer.init_state) must route to
    # the XLA path — a Mosaic kernel cannot execute on the CPU backend
    default_dev = jax.config.jax_default_device
    # jax_default_device may legally hold a platform STRING ("cpu" via
    # jax.default_device('cpu') or the JAX_DEFAULT_DEVICE env var), not just
    # a Device object
    platform = (getattr(default_dev, "platform", str(default_dev))
                if default_dev is not None else jax.default_backend())
    return (pltpu is not None) and aligned and (
        interpret or platform == "tpu")


def _attention_xla(theta: jax.Array, phi: jax.Array, g: jax.Array) -> jax.Array:
    scores = jnp.einsum("bnd,bmd->bnm", theta, phi)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(g.dtype)
    return jnp.einsum("bnm,bmd->bnd", w, g)


def _attn_kernel(t_ref, p_ref, g_ref, o_ref):
    t = t_ref[0]                                       # (N, D)
    p = p_ref[0]
    scores = jax.lax.dot_general(
        t, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (N, N) f32 in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / s).astype(g_ref.dtype)
    out = jnp.dot(w, g_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_attention(theta, phi, g, interpret=False):
    b, n, d = theta.shape
    return pl.pallas_call(
        _attn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), theta.dtype),
        interpret=interpret,
    )(theta, phi, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_nonlocal_attention(theta: jax.Array, phi: jax.Array, g: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """softmax(theta @ phi^T) @ g over [B, N, D] operands.

    Uses the fused Pallas kernel when shapes are MXU-aligned (both N and D
    multiples of 128) and a TPU pallas backend is available; falls back to the
    XLA einsum path otherwise.  `interpret=True` forces the kernel through
    the Pallas interpreter (for CPU testing).
    """
    b, n, d = theta.shape
    if not _use_pallas(n, d, interpret):
        return _attention_xla(theta, phi, g)
    return _pallas_attention(theta, phi, g, interpret=interpret)


def _attn_bwd_kernel(t_ref, p_ref, g_ref, do_ref, dt_ref, dp_ref, dg_ref):
    """Fused attention backward: recompute softmax in VMEM (flash-style —
    cheaper than round-tripping the N x N weights through HBM), then all
    four gradient matmuls on the MXU without materializing any N x N
    intermediate off-chip.  Peak VMEM ~(2 * N^2 + 6 * N * D) f32: ~9 MB at
    N=1024, D=128."""
    t = t_ref[0]                                       # (N, D)
    p = p_ref[0]
    scores = jax.lax.dot_general(
        t, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (N, N) f32
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)         # reuses scores' tile
    do = do_ref[0].astype(jnp.float32)                 # (N, D)
    g = g_ref[0].astype(jnp.float32)
    # dW = dout @ g^T;  dg = W^T @ dout
    dw = jax.lax.dot_general(
        do, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (N, N)
    dg_ref[0] = jax.lax.dot_general(
        w, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dg_ref.dtype)
    # dS = W * (dW - rowsum(dW * W))   (softmax jacobian), aliases dw
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dt_ref[0] = jax.lax.dot_general(
        ds, p.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt_ref.dtype)
    dp_ref[0] = jax.lax.dot_general(
        ds, t.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dp_ref.dtype)


def _pallas_attention_bwd(theta, phi, g, dout, interpret=False):
    b, n, d = theta.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=_VMEM)
    # each cotangent takes its own primal's dtype, matching _attention_bwd_xla
    # (theta/phi/g may have mixed dtypes)
    shapes = tuple(jax.ShapeDtypeStruct((b, n, d), x.dtype)
                   for x in (theta, phi, g))
    return pl.pallas_call(
        _attn_bwd_kernel,
        grid=(b,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=shapes,
        interpret=interpret,
    )(theta, phi, g, dout)


def _attention_bwd_xla(theta, phi, g, dout):
    scores = jnp.einsum("bnd,bmd->bnm", theta, phi).astype(jnp.float32)
    w = jax.nn.softmax(scores, axis=-1)
    dout32 = dout.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dw = jnp.einsum("bnd,bmd->bnm", dout32, g32)
    dg = jnp.einsum("bnm,bnd->bmd", w, dout32)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dtheta = jnp.einsum("bnm,bmd->bnd", ds, phi.astype(jnp.float32))
    dphi = jnp.einsum("bnm,bnd->bmd", ds, theta.astype(jnp.float32))
    return (dtheta.astype(theta.dtype), dphi.astype(phi.dtype),
            dg.astype(g.dtype))


def _fwd(theta, phi, g, interpret):
    out = fused_nonlocal_attention(theta, phi, g, interpret)
    return out, (theta, phi, g)


def _bwd(interpret, res, dout):
    theta, phi, g = res
    b, n, d = theta.shape
    if not _use_pallas(n, d, interpret):
        return _attention_bwd_xla(theta, phi, g, dout)
    return _pallas_attention_bwd(theta, phi, g, dout, interpret=interpret)


fused_nonlocal_attention.defvjp(_fwd, _bwd)
