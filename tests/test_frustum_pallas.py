"""Pallas frustum stereo sampler vs the einsum path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dfm_tpu.ops.frustum_separable as FS


def _interpret(fn, *args, **kw):
    from unittest import mock
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def call(*a, **k):
        k['interpret'] = True
        k.pop('compiler_params', None)
        return orig(*a, **k)

    with mock.patch.object(pl, 'pallas_call', call):
        return fn(*args, **kw)


def test_pallas_matches_einsum_path():
    from dfm_tpu.ops.pallas.frustum_sample import (
        frustum_stereo_sample_pallas)
    rng = np.random.RandomState(0)
    d, h, w, c = 6, 8, 16, 4
    nx, ny, nz = 10, 12, 5
    vol = jnp.asarray(rng.randn(d, h, w, c), jnp.float32).astype(
        jnp.bfloat16)
    pad = (32, 64)
    u = jnp.asarray(rng.rand(nx, ny) * 70 - 3, jnp.float32)
    v = jnp.asarray(rng.rand(nx, nz) * 36 - 2, jnp.float32)
    # static depth dict mirroring slab_depth_static's fields
    xs = np.linspace(2.0, 30.0, nx)
    ds = FS.slab_depth_static(xs, 2.0, 30.0, d)
    groups = FS._group_slabs(ds['z0'])
    runs = FS._runs(ds['z0'])

    want, valid_w = FS.separable_stereo_sample(vol, u, v, ds, pad)
    got, valid_g = _interpret(
        frustum_stereo_sample_pallas, vol, u, v, ds, pad,
        (groups[0], groups[1], groups[2], runs))

    np.testing.assert_array_equal(np.asarray(valid_w),
                                  np.asarray(valid_g))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=6e-2, rtol=6e-2)


def test_attention_pallas_matches_einsum():
    from dfm_tpu.ops.pallas.frustum_sample import attention_sample_pallas
    rng = np.random.RandomState(1)
    df, hf, wf = 12, 16, 32
    nx, ny, nz = 10, 12, 5
    sm = jnp.asarray(rng.rand(df, hf, wf), jnp.float32).astype(
        jnp.bfloat16)
    pad = (32, 64)
    u = jnp.asarray(rng.rand(nx, ny) * 70 - 3, jnp.float32)
    v = jnp.asarray(rng.rand(nx, nz) * 36 - 2, jnp.float32)
    xs = np.linspace(2.0, 30.0, nx)
    dsf = FS.slab_depth_static(xs, 2.0, 30.0, df)

    want = FS.separable_softmax_attention(sm, u, v, dsf, pad)
    got, _ = _interpret(attention_sample_pallas, sm, u, v, dsf, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2, rtol=6e-2)
