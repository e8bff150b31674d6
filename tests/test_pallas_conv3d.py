"""Pallas conv3d kernel: interpret-mode exactness on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.ops.pallas.conv3d import conv3d_pallas


def test_conv3d_pallas_interpret_matches_lax():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype(np.float32)) * 0.1
    out = conv3d_pallas(x, w, th=4, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3d_pallas_rect_channels():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 4, 24, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 16, 8).astype(np.float32)) * 0.1
    out = conv3d_pallas(x, w, th=4, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
