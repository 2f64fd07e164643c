"""Fused NonLocal attention kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (
    _attention_xla,
    _pallas_attention,
    fused_nonlocal_attention,
)


def _ops(rng, b=2, n=256, d=128, dtype=np.float32):
    t = rng.normal(scale=0.3, size=(b, n, d)).astype(dtype)
    p = rng.normal(scale=0.3, size=(b, n, d)).astype(dtype)
    g = rng.normal(scale=0.3, size=(b, n, d)).astype(dtype)
    return jnp.asarray(t), jnp.asarray(p), jnp.asarray(g)


def test_kernel_matches_xla_interpret(rng):
    t, p, g = _ops(rng)
    ref = np.asarray(_attention_xla(t, p, g))
    out = np.asarray(_pallas_attention(t, p, g, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dispatch_falls_back_off_tpu(rng):
    # unaligned D -> XLA path regardless of backend
    t, p, g = _ops(rng, d=96)
    ref = np.asarray(_attention_xla(t, p, g))
    out = np.asarray(fused_nonlocal_attention(t, p, g))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_gradients_match_xla(rng):
    """interpret=True routes BOTH directions through the Pallas kernels."""
    t, p, g = _ops(rng, b=1, n=128)

    def loss_fused(t, p, g):
        return jnp.sum(fused_nonlocal_attention(t, p, g, True) ** 2)

    def loss_ref(t, p, g):
        return jnp.sum(_attention_xla(t, p, g) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(t, p, g)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(t, p, g)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_bwd_kernel_matches_xla_bwd(rng):
    """The fused backward kernel against the plain-XLA gradient formulas,
    with a non-trivial upstream cotangent."""
    from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (
        _attention_bwd_xla,
        _pallas_attention_bwd,
    )

    t, p, g = _ops(rng, b=2, n=256)
    dout = jnp.asarray(rng.normal(scale=0.5, size=t.shape).astype(np.float32))
    ref = _attention_bwd_xla(t, p, g, dout)
    out = _pallas_attention_bwd(t, p, g, dout, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_bwd_kernel_bf16(rng):
    """bf16 operands (the training compute dtype) stay finite and track the
    f32 reference within bf16 tolerance."""
    from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (
        _attention_bwd_xla,
        _pallas_attention_bwd,
    )

    t, p, g = _ops(rng, b=1, n=128)
    dout = jnp.asarray(rng.normal(scale=0.5, size=t.shape).astype(np.float32))
    args16 = [x.astype(jnp.bfloat16) for x in (t, p, g, dout)]
    ref = _attention_bwd_xla(t, p, g, dout)
    out = _pallas_attention_bwd(*args16, interpret=True)
    for a, b in zip(out, ref):
        a = np.asarray(a, np.float32)
        np.testing.assert_allclose(a, np.asarray(b), atol=0.05, rtol=0.05)
        assert np.isfinite(a).all()


def test_bwd_kernel_mixed_dtypes(rng):
    """Each cotangent takes its own primal's dtype (theta/phi bf16, g f32),
    matching the XLA fallback — regression for the kernel forcing all three
    to theta.dtype."""
    from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (
        _pallas_attention_bwd,
    )

    t, p, g = _ops(rng, b=1, n=128)
    dout = jnp.asarray(rng.normal(scale=0.5, size=t.shape).astype(np.float32))
    dt_, dp_, dg_ = _pallas_attention_bwd(
        t.astype(jnp.bfloat16), p.astype(jnp.bfloat16), g, dout,
        interpret=True)
    assert dt_.dtype == jnp.bfloat16
    assert dp_.dtype == jnp.bfloat16
    assert dg_.dtype == jnp.float32


def test_softmax_rows_sum_to_one_property(rng):
    """Attention output of constant g equals g (softmax rows sum to 1)."""
    t, p, _ = _ops(rng, b=1, n=128)
    g = jnp.ones((1, 128, 128), jnp.float32) * 0.7
    out = np.asarray(_pallas_attention(t, p, g, interpret=True))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)
