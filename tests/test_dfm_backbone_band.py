"""Banded vs dense DfMBackbone equivalence.

The banded dres path (use_band=True) must produce the same parameter
tree and the same outputs as the dense path — it is an exact
reorganization, not an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models.backbones.dfm_backbone import DfMBackbone


def _inputs(rng):
    b, h, w, c = 2, 16, 24, 8
    cur = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    prev = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    depths = jnp.linspace(2.0, 40.0, 8)
    cam2img = jnp.tile(jnp.asarray([[100., 0., 48., 0.],
                                    [0., 100., 32., 0.],
                                    [0., 0., 1., 0.],
                                    [0., 0., 0., 1.]]), (b, 1, 1))
    cur2prev = jnp.tile(jnp.eye(4).at[0, 3].set(0.3), (b, 1, 1))
    return cur, prev, depths, cam2img, cur2prev


def test_reduced_depth_mono_matches_dense():
    """D=48 engages the reduced-depth mono path (hourglass + pred on 44
    slices + weighted GN + index expansion) — must equal dense."""
    rng = np.random.RandomState(3)
    b, h, w, c = 1, 8, 16, 8
    cur = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    prev = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    depths = jnp.linspace(2.0, 40.0, 48)
    cam2img = jnp.tile(jnp.asarray([[100., 0., 32., 0.],
                                    [0., 100., 16., 0.],
                                    [0., 0., 1., 0.],
                                    [0., 0., 0., 1.]]), (b, 1, 1))
    cur2prev = jnp.tile(jnp.eye(4).at[0, 3].set(0.3), (b, 1, 1))
    kw = dict(in_channels=8, cv_channels=8, num_hg=1,
              cost_sample_factor=2, num_depth_bins_out=48, norm='gn')
    banded = DfMBackbone(use_band=True, **kw)
    dense = DfMBackbone(use_band=False, **kw)

    from dfm_tpu.ops.reduced_depth import make_reduced_plan
    assert make_reduced_plan(48, e=2) is not None  # path engaged

    params = banded.init(jax.random.PRNGKey(0), cur, prev, depths,
                         cam2img, cur2prev)
    params_d = dense.init(jax.random.PRNGKey(0), cur, prev, depths,
                          cam2img, cur2prev)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_d))

    out_b = banded.apply(params, cur, prev, depths, cam2img, cur2prev)
    out_d = dense.apply(params, cur, prev, depths, cam2img, cur2prev)
    for got, want, tag in zip(out_b, out_d,
                              ('cost', 'stereo_feats', 'mono_feats')):
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=tag)


def test_band_path_matches_dense():
    rng = np.random.RandomState(1)
    cur, prev, depths, cam2img, cur2prev = _inputs(rng)
    kw = dict(in_channels=8, cv_channels=8, num_hg=1,
              cost_sample_factor=2, num_depth_bins_out=8, norm='gn')
    banded = DfMBackbone(use_band=True, **kw)
    dense = DfMBackbone(use_band=False, **kw)

    params = banded.init(jax.random.PRNGKey(0), cur, prev, depths,
                         cam2img, cur2prev)
    params_d = dense.init(jax.random.PRNGKey(0), cur, prev, depths,
                          cam2img, cur2prev)
    # identical parameter trees (checkpoint interchangeability)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_d))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(params_d)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)

    out_b = banded.apply(params, cur, prev, depths, cam2img, cur2prev)
    out_d = dense.apply(params, cur, prev, depths, cam2img, cur2prev)
    for got, want, tag in zip(out_b, out_d,
                              ('cost', 'stereo_feats', 'mono_feats')):
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=tag)
