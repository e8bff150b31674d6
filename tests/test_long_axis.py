"""Depth-axis sharding (parallel/long_axis.py) + PAConv regularizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.parallel.long_axis import (DEPTH_AXIS, depth_shard_spec,
                                        depth_sharded_conv_gn,
                                        pad_depth_for_mesh)


def _mesh(n):
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f'needs {n} devices')
    return Mesh(np.asarray(devs[:n]), (DEPTH_AXIS,))


def _dense_conv_gn(x, w, scale, bias, groups, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    b = y.shape[0]
    c = y.shape[-1]
    g = groups
    yy = y.reshape(b, -1, g, c // g)
    mean = yy.mean(axis=(1, 3))
    var = (yy * yy).mean(axis=(1, 3)) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    sc = (scale.reshape(g, c // g)[None] * rstd[..., None]).reshape(
        b, 1, 1, 1, c)
    bi = (bias.reshape(g, c // g)[None] - mean[..., None] *
          scale.reshape(g, c // g)[None] * rstd[..., None]).reshape(
              b, 1, 1, 1, c)
    return jnp.maximum(y * sc + bi, 0.0)


@pytest.mark.parametrize('n', [2, 8])
def test_depth_sharded_conv_gn_matches_dense(n):
    mesh = _mesh(n)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 6, 10, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 16) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)

    want = _dense_conv_gn(x, w, scale, bias, groups=4)
    got = depth_sharded_conv_gn(
        jax.device_put(x, depth_shard_spec(mesh)), w, scale, bias,
        num_groups=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # output really is sharded on D
    assert got.sharding.spec[1] == DEPTH_AXIS


def test_depth_sharded_grad_flows():
    mesh = _mesh(2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 4, 4, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 8) * 0.1, jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    def f(w_):
        return depth_sharded_conv_gn(x, w_, scale, bias, 4, mesh).sum()

    def fd(w_):
        return _dense_conv_gn(x, w_, scale, bias, 4).sum()

    g = jax.grad(f)(w)
    gd = jax.grad(fd)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=2e-4, atol=2e-4)


def test_pad_depth_for_mesh():
    x = jnp.ones((1, 10, 2, 2, 3))
    xp, d = pad_depth_for_mesh(x, 8)
    assert xp.shape[1] == 16 and d == 10
    assert float(xp[:, 10:].sum()) == 0.0


def test_paconv_regularization_loss():
    from dfm_tpu.core.losses import paconv_regularization_loss
    rng = np.random.RandomState(0)
    # identical kernels -> cos sim 1 -> K*(K-1)/2 per bank
    bank_same = jnp.asarray(np.tile(rng.randn(4, 1, 6), (1, 3, 1)
                                    ).reshape(4, 18), jnp.float32)
    loss = paconv_regularization_loss([bank_same], num_kernels=3,
                                      reduction='sum')
    assert float(loss) == pytest.approx(3.0, rel=1e-5)
    # orthogonal kernels -> ~0
    k = np.zeros((4, 3, 6), np.float32)
    k[0, 0, 0] = k[1, 1, 0] = k[2, 2, 0] = 1.0
    loss0 = paconv_regularization_loss([jnp.asarray(k.reshape(4, 18))],
                                       num_kernels=3, reduction='mean')
    assert float(loss0) == pytest.approx(0.0, abs=1e-6)
