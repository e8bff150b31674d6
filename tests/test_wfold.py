"""W-folded 2D conv lowering (ops/wfold.py): exactness vs the dense
conv at the shapes the DfM image path uses it for (SPPUNetNeck stereo
head / UpconvModule laterals; reference spp_unet_neck.py:14-119)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfm_tpu.ops.wfold import fold_kernel_w, wfold_conv2d


def _dense(x, k):
    ky, kx = k.shape[:2]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(ky // 2, ky // 2), (kx // 2, kx // 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('ci,co,kx,g', [
    (32, 32, 3, 4),     # neck stereo ConvNorm
    (3, 32, 3, 4),      # upconv full-res lateral
    (32, 32, 1, 4),     # neck stereo 1x1
    (8, 16, 3, 2),
    (5, 7, 3, 4),       # ragged channel counts
])
def test_wfold_matches_dense(ci, co, kx, g):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 8 * g, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3 if kx == 3 else 1, kx, ci, co) * 0.1,
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(wfold_conv2d(x, k, g)),
                               np.asarray(_dense(x, k)),
                               rtol=1e-5, atol=1e-5)


def test_fold_kernel_band_structure():
    # every nonzero (gi, go, dq) block must satisfy dx = g*dq + gi - go
    # in [-1, 1]; everything else must be exactly zero
    g, ci, co = 4, 3, 5
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
    kf = np.asarray(fold_kernel_w(k, g))
    assert kf.shape == (3, 3, g * ci, g * co)
    for go in range(g):
        for gi in range(g):
            for qi in range(3):
                blk = kf[:, qi, gi * ci:(gi + 1) * ci,
                         go * co:(go + 1) * co]
                dx = g * (qi - 1) + gi - go
                if -1 <= dx <= 1:
                    np.testing.assert_array_equal(blk,
                                                  np.asarray(k[:, dx + 1]))
                else:
                    assert not blk.any()


@pytest.mark.parametrize('k,ci,co', [(7, 3, 16), (3, 4, 8), (5, 2, 6)])
def test_s2d_stride2_matches_dense(k, ci, co):
    from dfm_tpu.ops.wfold import s2d_conv2d_s2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, ci), jnp.float32)
    kk = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kk, (2, 2), [(k // 2, k // 2)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(s2d_conv2d_s2(x, kk)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv2d_stride2_module_param_tree():
    import flax.linen as nn
    from dfm_tpu.models.layers import Conv2DStride2
    x = jnp.zeros((1, 8, 12, 3))
    va = Conv2DStride2(16, (7, 7)).init(jax.random.PRNGKey(0), x)
    vb = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                 use_bias=False).init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, va) == jax.tree.map(jnp.shape, vb)
    ya = Conv2DStride2(16, (7, 7)).apply(va, x)
    yb = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                 use_bias=False).apply(vb, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)


def test_conv2d_module_param_tree_matches_nn_conv():
    # layers.Conv2D must be checkpoint-compatible with the nn.Conv it
    # replaced inside ConvNorm / SPPUNetNeck
    import flax.linen as nn
    from dfm_tpu.models.layers import Conv2D
    x = jnp.zeros((1, 4, 8, 6))
    va = Conv2D(10, (3, 3), use_bias=True).init(jax.random.PRNGKey(0), x)
    vb = nn.Conv(10, (3, 3), padding=[(1, 1), (1, 1)],
                 use_bias=True).init(jax.random.PRNGKey(0), x)
    sa = jax.tree.map(jnp.shape, va)
    sb = jax.tree.map(jnp.shape, vb)
    assert sa == sb
    # same init -> same forward
    ya = Conv2D(10, (3, 3), use_bias=True).apply(va, x)
    yb = nn.Conv(10, (3, 3), padding=[(1, 1), (1, 1)],
                 use_bias=True).apply(vb, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)
