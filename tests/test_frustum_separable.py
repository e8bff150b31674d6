"""Separable (per-x-slab matmul) frustum sampling vs the generic
gather path — must agree exactly for KITTI P-form matrices."""

import numpy as np
import jax
import jax.numpy as jnp

from dfm_tpu.ops import frustum, packed_sample as PS
from dfm_tpu.ops import frustum_separable as FS


def _setup(seed=0, nx=12, ny=10, nz=5, d=6, h=8, w=16, c=4,
           pad_shape=(32, 64), aug=False):
    rng = np.random.RandomState(seed)
    vol = jnp.asarray(rng.randn(d, h, w, c).astype(np.float32))
    cost = jnp.asarray(rng.randn(d, h, w).astype(np.float32))
    sem = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    dmin, dmax = 2.0, 20.0
    # voxel grid: x spans the depth range (plus a bit out of range to
    # exercise masking), y/z span a broad frustum
    xs = np.linspace(1.5, 21.0, nx, dtype=np.float32)
    ys = np.linspace(-8.0, 8.0, ny, dtype=np.float32)
    zs = np.linspace(-2.0, 1.0, nz, dtype=np.float32)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0], cam[1, 1] = 50.0, 48.0
    cam[0, 2], cam[1, 2] = pad_shape[1] / 2, pad_shape[0] / 2
    cam[0, 3], cam[1, 3], cam[2, 3] = 2.7, -1.1, 0.01  # P2-style trans
    if aug:
        # scale + crop + flip composed the way the pipeline tracks them
        scale, off_x, off_y = 0.8, 3.0, 1.0
        s = np.diag([scale, scale, 1.0, 1.0]).astype(np.float32)
        s[0, 3], s[1, 3] = -off_x, -off_y
        cam = (s @ cam).astype(np.float32)
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing='ij')
    coors = jnp.asarray(np.stack([xx, yy, zz], -1))  # (nz, ny, nx, 3)
    return vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad_shape


def test_slab_uv_matches_projection():
    vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad = _setup()
    coord_img = frustum.project_voxels_to_frustum(coors, jnp.asarray(cam))
    u, v = FS.slab_uv(jnp.asarray(cam), xs, ys, zs)
    # coord_img[z, y, x, 0] == u[x, y];  [..., 1] == v[x, z]
    np.testing.assert_allclose(
        np.asarray(coord_img[..., 0]),
        np.broadcast_to(np.asarray(u).T[None], coord_img.shape[:-1]),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(coord_img[..., 1]),
        np.broadcast_to(np.asarray(v).T[:, None, :], coord_img.shape[:-1]),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(coord_img[..., 2]),
        np.broadcast_to(xs[None, None], coord_img.shape[:-1]), atol=1e-6)


def test_separable_stereo_matches_packed():
    for aug in (False, True):
        vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad = _setup(
            aug=aug)
        coord_img = frustum.project_voxels_to_frustum(coors,
                                                      jnp.asarray(cam))
        ref, ref_v2d, _ = frustum.sample_stereo_volume_packed(
            PS.pack_taps_3d(vol), vol.shape[-1], coord_img, pad, dmin, dmax)
        u, v = FS.slab_uv(jnp.asarray(cam), xs, ys, zs)
        ds = FS.slab_depth_static(xs, dmin, dmax, vol.shape[0])
        out, v2d = FS.separable_stereo_sample(vol, u, v, ds, pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(v2d), np.asarray(ref_v2d))


def test_separable_sem_matches_packed():
    vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad = _setup()
    coord_img = frustum.project_voxels_to_frustum(coors, jnp.asarray(cam))
    _, valid2d, _ = frustum.sample_stereo_volume_packed(
        PS.pack_taps_3d(vol), vol.shape[-1], coord_img, pad, dmin, dmax)
    ref = frustum.sample_sem_features_packed(
        PS.pack_taps_2d(sem), sem.shape[-1], coord_img, pad, valid2d)
    u, v = FS.slab_uv(jnp.asarray(cam), xs, ys, zs)
    ds = FS.slab_depth_static(xs, dmin, dmax, vol.shape[0])
    _, v2d = FS.separable_stereo_sample(vol, u, v, ds, pad)
    out = FS.separable_sem_sample(sem, u, v, pad, v2d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_separable_attention_matches_packed():
    up = 4
    for aug in (False, True):
        vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad = _setup(
            aug=aug)
        coord_img = frustum.project_voxels_to_frustum(coors,
                                                      jnp.asarray(cam))
        packed = frustum.build_packed_fine_softmax(cost[:, :, :, 0]
                                                   if cost.ndim == 4
                                                   else cost,
                                                   up, pad,
                                                   dtype=jnp.float32)
        ref = frustum.sample_fine_softmax_packed(
            packed, coord_img, pad, dmin, dmax, up)
        u, v = FS.slab_uv(jnp.asarray(cam), xs, ys, zs)
        dsf = FS.slab_depth_static(xs, dmin, dmax, cost.shape[0] * up)
        sm = FS.build_fine_softmax_volume(cost, up, pad, dtype=jnp.float32)
        att = FS.separable_softmax_attention(sm, u, v, dsf, pad)
        np.testing.assert_allclose(np.asarray(att), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_kitti_p2_is_separable():
    p2 = np.array([[721.5, 0, 609.6, 44.9],
                   [0, 721.5, 172.9, 0.22],
                   [0, 0, 1.0, 0.003],
                   [0, 0, 0, 1.0]], np.float32)
    assert FS.is_separable_cam(p2)
    skew = p2.copy()
    skew[0, 1] = 0.5
    assert not FS.is_separable_cam(skew)


def test_frustum_neck_separable_vs_generic():
    """FrustumToVoxel with the separable fast path must match the
    generic gather path on a KITTI-style camera."""
    import flax
    from dfm_tpu.models.necks.frustum_to_voxel import FrustumToVoxel
    vol, cost, sem, xs, ys, zs, cam, coors, dmin, dmax, pad = _setup()
    coors_np = np.asarray(coors)
    kw = dict(num_3dconvs=1, out_channels=8, depth_min=dmin, depth_max=dmax,
              up_factor=4, pool_z=1, norm='gn')
    neck_s = FrustumToVoxel(separable=True, **kw)
    neck_g = FrustumToVoxel(separable=False, **kw)
    var = neck_s.init(jax.random.PRNGKey(0), vol[None], cost[None],
                      sem[None], coors_np, jnp.asarray(cam)[None], pad)
    out_s = neck_s.apply(var, vol[None], cost[None], sem[None], coors_np,
                         jnp.asarray(cam)[None], pad)
    out_g = neck_g.apply(var, vol[None], cost[None], sem[None], coors_np,
                         jnp.asarray(cam)[None], pad)
    assert out_s.shape == out_g.shape
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g),
                               rtol=1e-3, atol=2e-3)
