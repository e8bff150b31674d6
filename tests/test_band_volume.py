"""Exactness of depth-banded volumes (ops/band_volume.py) vs dense ops.

The banded representation must be bit-for-bit a reorganization of the
dense computation (same conv/GN/relu math, same dtype path), so the
tolerance here is tight f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.ops.band_volume import (
    BandVol, band_add, band_conv3, band_from_const, band_gn, band_relu,
    band_to_dense, dual_conv3)

D, H, W, C = 10, 6, 7, 8


def _dense_conv3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _dense_gn(x, scale, bias, groups, eps=1e-5):
    b = x.shape[0]
    g = groups
    xx = x.reshape(b, -1, g, x.shape[-1] // g).astype(jnp.float32)
    mean = xx.mean(axis=(1, 3), keepdims=True)
    var = ((xx - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xx = (xx - mean) * jax.lax.rsqrt(var + eps)
    return (xx.reshape(x.shape) * scale + bias).astype(x.dtype)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_band_conv_chain_exact(rng):
    """const volume -> conv -> conv matches dense conv of the broadcast."""
    x2d = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 3, C, C), jnp.float32) * 0.1
    k2 = jnp.asarray(rng.randn(3, 3, 3, C, C), jnp.float32) * 0.1

    bv = band_conv3(band_from_const(x2d, D), k1)
    assert bv.lo.shape[1] == 1
    bv = band_conv3(bv, k2)
    assert bv.lo.shape[1] == 2

    dense = jnp.broadcast_to(x2d[:, None], (2, D, H, W, C))
    want = _dense_conv3(_dense_conv3(dense, k1), k2)
    np.testing.assert_allclose(band_to_dense(bv), want, rtol=1e-5,
                               atol=1e-5)


def test_band_gn_relu_add_exact(rng):
    x2d = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, C, C), jnp.float32) * 0.1
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)

    bv = band_conv3(band_from_const(x2d, D), k)
    bv = band_gn(bv, scale, bias, num_groups=4)
    bv = band_relu(bv)

    dense = _dense_conv3(jnp.broadcast_to(x2d[:, None], (2, D, H, W, C)), k)
    want = jax.nn.relu(_dense_gn(dense, scale, bias, 4))
    np.testing.assert_allclose(band_to_dense(bv), want, rtol=1e-5,
                               atol=1e-5)

    # residual add of bands with different widths
    bv2 = band_conv3(bv, k)                      # E: 1 -> 2
    summed = band_add(bv2, bv)
    want2 = _dense_conv3(want, k) + want
    np.testing.assert_allclose(band_to_dense(summed), want2, rtol=1e-5,
                               atol=1e-5)


def test_band_gn_per_channel_groups(rng):
    """groups == channels (the DfM cv_channels=32 regime)."""
    x2d = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, C, C), jnp.float32) * 0.1
    scale = jnp.ones(C, jnp.float32)
    bias = jnp.zeros(C, jnp.float32)
    bv = band_gn(band_conv3(band_from_const(x2d, D), k), scale, bias,
                 num_groups=C)
    dense = _dense_conv3(jnp.broadcast_to(x2d[:, None], (1, D, H, W, C)), k)
    want = _dense_gn(dense, scale, bias, C)
    np.testing.assert_allclose(band_to_dense(bv), want, rtol=1e-5,
                               atol=1e-5)


def test_dual_conv3_exact(rng):
    """[cur_bcast || prev] conv == dual_conv3(cur2d, prev)."""
    cur2d = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
    prev = jnp.asarray(rng.randn(2, D, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 2 * C, C), jnp.float32) * 0.1

    got = dual_conv3(cur2d, prev, k)
    cat = jnp.concatenate(
        [jnp.broadcast_to(cur2d[:, None], prev.shape), prev], axis=-1)
    want = _dense_conv3(cat, k)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_band_bf16_path(rng):
    """bf16 interior/edges stay consistent with a bf16 dense compute."""
    x2d = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, C, C), jnp.float32) * 0.1
    bv = band_conv3(band_from_const(x2d, D), k)
    dense = _dense_conv3(
        jnp.broadcast_to(x2d[:, None], (1, D, H, W, C)),
        k.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(band_to_dense(bv), np.float32),
        np.asarray(dense, np.float32), rtol=2e-2, atol=2e-2)
