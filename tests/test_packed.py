"""Packed (phase-aligned space-to-depth) decoder ops vs their direct forms.

The packed decoder tail is an exact linear-algebra rewrite (ops/packed.py);
these tests assert numerical agreement with jax.lax / flax reference paths
in float32, where only accumulation-order noise remains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from blindshadowremoval_tpu.ops.packed import (
    conv1x1_packed,
    conv_same_packed,
    conv_same_packed_kernel,
    convt_packed,
    convt_packed_kernel,
    pack_image,
    tile_phase,
    unpack_image,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 8, 10, 5)
    np.testing.assert_array_equal(unpack_image(pack_image(x), 5), x)


def test_convt_packed_matches_conv_transpose():
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 16, 12, 7)
    w = _rand(rng, 3, 3, 7, 9)
    ref = lax.conv_transpose(x, w, (2, 2), "SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack_image(convt_packed(x, convt_packed_kernel(w)), 9)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_conv_same_packed_matches_same_conv(k):
    rng = np.random.default_rng(k)
    x = _rand(rng, 2, 16, 12, 6)
    w = _rand(rng, k, k, 6, 4)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack_image(
        conv_same_packed(pack_image(x), conv_same_packed_kernel(w)), 4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv1x1_packed_matches_1x1():
    rng = np.random.default_rng(9)
    x = _rand(rng, 2, 16, 12, 6)
    w = _rand(rng, 1, 1, 6, 5)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack_image(conv1x1_packed(pack_image(x), w), 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_tile_phase_matches_elementwise_affine():
    rng = np.random.default_rng(3)
    x = _rand(rng, 1, 8, 8, 6)
    scale, bias = _rand(rng, 6), _rand(rng, 6)
    ref = x * scale + bias
    got = unpack_image(pack_image(x) * tile_phase(scale) + tile_phase(bias), 6)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
