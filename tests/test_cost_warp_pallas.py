"""Cost-warp Pallas kernel (interpret mode) vs the packed gather path.

The kernel must reproduce bilinear zero-padding sampling exactly
(modulo bf16 rounding of hat weights) whenever its band precondition
holds, and must report ok=False when it does not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.ops.packed_sample import pack_taps_2d, packed_bilinear_sample


def _reference(prev, u, v):
    grid = jnp.stack([u, v], axis=-1)          # (B, D, Hq, Wq, 2)
    c = prev.shape[-1]
    return jax.vmap(lambda f, g: packed_bilinear_sample(
        pack_taps_2d(f), g, c))(prev, grid)


def _warp_interpret(prev, u, v, k=4):
    from unittest import mock
    from jax.experimental import pallas as pl
    import dfm_tpu.ops.pallas.cost_warp as cw
    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw['interpret'] = True
        kw.pop('compiler_params', None)
        return orig(*a, **kw)

    with mock.patch.object(pl, 'pallas_call', interp_call):
        out = cw.warp_prev_band.__wrapped__(prev, u, v, k=k)
    return out, cw.band_ok(v, prev.shape[1], k)


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 24, 64, 32
    d, hq, wq = 3, 6, 16
    prev = jnp.asarray(rng.randn(b, h, w, c), jnp.float32).astype(
        jnp.bfloat16)
    # smooth grids: u sweeps the width, v wanders within a < 3-row band
    base_v = rng.rand(b, d, hq, 1) * (h - 2)
    v = jnp.asarray(base_v + rng.rand(b, d, hq, wq) * 1.5, jnp.float32)
    u = jnp.asarray(
        np.linspace(-2, w + 1, wq)[None, None, None, :] +
        rng.rand(b, d, hq, wq), jnp.float32)
    return prev, u, v


def test_warp_matches_packed_gather(data):
    prev, u, v = data
    out, ok = _warp_interpret(prev, u, v)
    assert bool(ok)
    want = _reference(prev, u, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2)


def test_warp_oob_rows_zero(data):
    prev, u, v = data
    v = v + 1000.0          # far outside the image
    out, ok = _warp_interpret(prev, u, v)
    assert bool(ok)         # band fits (clipped); taps all zero-weight
    assert float(jnp.abs(out.astype(jnp.float32)).max()) == 0.0


def test_warp_reports_band_violation(data):
    prev, u, v = data
    v = v.at[0, 0, 0, 0].set(2.0).at[0, 0, 0, 1].set(20.0)  # span 18
    _, ok = _warp_interpret(prev, u, v)
    assert not bool(ok)
