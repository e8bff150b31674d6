"""Packed-layout conv chain (ops/pallas/conv_chain.py): exactness vs the
dense lowering, and the integrated DfMBackbone packed path vs the dense
path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfm_tpu.ops.pallas.conv_chain import (
    conv_p2p, dres0_stats_affine, gn_from_partials, pack_vol,
    pack_vol_ref, unpack_affine_res, unpack_vol, unpack_vol_ref)

D, H, W, TH = 8, 16, 32, 8


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(0)
    x = rng.randn(D, H, W, 32).astype(np.float32)
    k = (rng.randn(3, 3, 3, 32, 32) * 0.1).astype(np.float32)
    return x, k


def dense_conv(x, k):
    return jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(k), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]


def test_pack_unpack_roundtrip(data):
    x, _ = data
    for phase in (0, 2):
        pv = pack_vol(jnp.asarray(x), phase=phase, th=TH, interpret=True)
        ref = pack_vol_ref(jnp.asarray(x), phase=phase, th=TH)
        np.testing.assert_array_equal(np.asarray(pv.data),
                                      np.asarray(ref.data))
        back = unpack_vol(pv, interpret=True)
        np.testing.assert_array_equal(np.asarray(back), x)


def test_conv_p2p_both_phases_and_chain(data):
    x, k = data
    ref = np.asarray(dense_conv(x, k))
    for phase in (0, 2):
        pv = pack_vol_ref(jnp.asarray(x), phase=phase, th=TH)
        out, ps = conv_p2p(pv, jnp.asarray(k), interpret=True)
        got = np.asarray(unpack_vol_ref(out))
        np.testing.assert_allclose(got, ref, atol=1e-4)
        s = np.asarray(ps[..., 0, :]).sum((0, 1)).reshape(4, 32).sum(0)
        np.testing.assert_allclose(s, ref.sum((0, 1, 2)), rtol=1e-4,
                                   atol=1e-2)
    # phase alternation: conv(conv(x)) without intermediate unpack
    pv = pack_vol_ref(jnp.asarray(x), phase=0, th=TH)
    o1, _ = conv_p2p(pv, jnp.asarray(k), interpret=True)
    o2, _ = conv_p2p(o1, jnp.asarray(k), interpret=True)
    refc = np.asarray(dense_conv(np.asarray(dense_conv(x, k)), k))
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(o2)), refc,
                               atol=1e-3)


def test_gn_exit_paths(data):
    x, k = data
    from dfm_tpu.models.layers import GroupNorm
    rng = np.random.RandomState(1)
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)
    gn = GroupNorm(num_groups=32)
    v = {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)}}
    ref = np.asarray(dense_conv(x, k))
    refgn = np.asarray(gn.apply(v, jnp.asarray(ref)[None]))[0]

    pv = pack_vol_ref(jnp.asarray(x), phase=0, th=TH)
    out, ps = conv_p2p(pv, jnp.asarray(k), interpret=True)
    y = gn_from_partials(ps, out, scale, bias, 32, relu=True)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(y)),
                               np.maximum(refgn, 0), atol=1e-4)

    # unpack_affine_res: GN(conv(y)) + y with y phase 2
    u1, ps1 = conv_p2p(y, jnp.asarray(k), interpret=True)
    y_d = np.asarray(unpack_vol_ref(y))
    refu1 = np.asarray(dense_conv(y_d, k))
    refgn1 = np.asarray(gn.apply(v, jnp.asarray(refu1)[None]))[0]
    got = np.asarray(unpack_affine_res(u1, ps1, scale, bias, 32,
                                       res_pv=y, interpret=True))
    np.testing.assert_allclose(got, refgn1 + y_d, atol=1e-4)


def test_dres0_fused_vs_dual_conv(data):
    x, _ = data
    rng = np.random.RandomState(2)
    k64 = (rng.randn(3, 3, 3, 64, 32) * 0.1).astype(np.float32)
    cur2d = rng.randn(H, W, 32).astype(np.float32)
    from dfm_tpu.models.layers import GroupNorm
    from dfm_tpu.ops.band_volume import dual_conv3
    gn = GroupNorm(num_groups=32)
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)
    v = {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)}}
    dense = np.asarray(dual_conv3(jnp.asarray(cur2d)[None],
                                  jnp.asarray(x)[None], jnp.asarray(k64))[0])
    ref = np.maximum(np.asarray(gn.apply(v, jnp.asarray(dense)[None]))[0], 0)

    from dfm_tpu.models.backbones.dfm_backbone import packed_stereo_stem
    def conv2d(img, kk):
        return jax.lax.conv_general_dilated(
            jnp.asarray(img)[None], jnp.asarray(kk), (1, 1), [(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    k_cur = k64[..., :32, :]
    ci = conv2d(cur2d, k_cur.sum(0))
    pv = pack_vol_ref(jnp.asarray(x), phase=0, th=TH)
    u0, ps0 = conv_p2p(pv, jnp.asarray(k64[..., 32:, :]), interpret=True)
    clo = ci - conv2d(cur2d, k_cur[0])
    chi = ci - conv2d(cur2d, k_cur[2])
    y0 = dres0_stats_affine(u0, ps0, ci, clo, chi, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(y0)), ref,
                               atol=1e-4)


def test_backbone_packed_vs_dense(monkeypatch):
    """Integrated DfMBackbone: DFM_PACKED=interpret path == dense path."""
    from dfm_tpu.models.backbones.dfm_backbone import DfMBackbone
    rng = np.random.RandomState(3)
    b, hf, wf, c = 1, 32, 64, 32
    d = 8
    cur = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    prev = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    depths = jnp.linspace(2.0, 10.0, d)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 50.0
    cam[0, 2], cam[1, 2] = wf / 2, hf / 2
    cam2img = jnp.tile(jnp.asarray(cam)[None], (b, 1, 1))
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 3] = 0.3
    cur2prev = jnp.tile(jnp.asarray(c2p)[None], (b, 1, 1))

    def run():
        mdl = DfMBackbone(in_channels=c, cv_channels=32,
                          cost_sample_factor=4, num_depth_bins_out=d,
                          norm='gn', dtype=jnp.bfloat16)
        v = mdl.init(jax.random.PRNGKey(0), cur, prev, depths, cam2img,
                     cur2prev)
        out = mdl.apply(v, cur, prev, depths, cam2img, cur2prev)
        return [np.asarray(o, np.float32) for o in out]

    monkeypatch.setenv('DFM_PACKED', '0')
    dense = run()
    monkeypatch.setenv('DFM_PACKED', 'interpret')
    packd = run()
    for a, b_ in zip(dense, packd):
        assert a.shape == b_.shape
        # bf16 compute: identical math up to accumulation order
        np.testing.assert_allclose(a, b_, atol=0.15, rtol=0.15)


def test_conv_s2_p2d_vs_dense_strided(data):
    from dfm_tpu.ops.pallas.conv_chain import conv_s2_p2d
    rng = np.random.RandomState(7)
    x, _ = data
    k64 = (rng.randn(3, 3, 3, 32, 64) * 0.1).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(k64), (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]
    for phase in (0, 2):
        pv = pack_vol_ref(jnp.asarray(x), phase=phase)
        out, ps = conv_s2_p2d(pv, jnp.asarray(k64), th2=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
        su = np.asarray(ps[..., 0, :]).sum(axis=(0, 1))
        lane = np.zeros(128)
        r = np.asarray(ref)
        for g2 in range(2):
            lane[g2 * 64:(g2 + 1) * 64] = r[g2::2].sum(axis=(0, 1, 2))
        np.testing.assert_allclose(su, lane, rtol=1e-4, atol=1e-3)


def test_gn_affine_res_packed_matches_unpack(data):
    from dfm_tpu.ops.pallas.conv_chain import gn_affine_res_packed
    rng = np.random.RandomState(8)
    x, k = data
    sc = (rng.rand(32) + 0.5).astype(np.float32)
    bs = rng.randn(32).astype(np.float32)
    pv2 = pack_vol_ref(jnp.asarray(x), phase=2)
    u, ps = conv_p2p(pv2, jnp.asarray(k), interpret=True)
    dense_ref = np.asarray(unpack_affine_res(
        u, ps, sc, bs, 32, res_pv=pv2, relu=False, interpret=True))
    out_pv = gn_affine_res_packed(u, ps, sc, bs, 32, res_pv=pv2,
                                  relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(out_pv)),
                               dense_ref, atol=1e-5)
    # stored padding must remain exactly zero
    dat = np.asarray(out_pv.data)
    mask = np.ones_like(dat, bool)
    mask[:, out_pv.th:out_pv.th + H, :W, :] = False
    assert np.abs(dat[mask]).max() == 0.0


def test_convt1_parity_and_pack8_vs_convtranspose(data):
    import flax.linen as nn
    from dfm_tpu.ops.pallas.conv_chain import convt1_parity, pack_parity8
    rng = np.random.RandomState(9)
    d2, h2, w2 = D // 2, H // 2, W // 2
    x = jnp.asarray(rng.randn(d2, h2, w2, 64).astype(np.float32))
    mod = nn.ConvTranspose(32, (3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 2)] * 3, use_bias=False)
    v = mod.init(jax.random.PRNGKey(0), x[None])
    ref = np.asarray(mod.apply(v, x[None])[0])
    par = convt1_parity(x, v['params']['kernel'])
    pv, ps = pack_parity8(par, th=TH, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(pv)), ref,
                               atol=1e-4)
    su = np.asarray(ps[..., 0, :]).sum(axis=(0, 1))
    lane = ref.reshape(D // 4, 4, H, W, 32).transpose(1, 4, 0, 2, 3)
    lane = lane.reshape(4, 32, -1).sum(-1).reshape(128)
    np.testing.assert_allclose(su, lane, rtol=1e-3, atol=1e-3)


def test_packed_hourglass_vs_dense_hourglass():
    """packed_hourglass == x + Hourglass(x) on identical params."""
    from dfm_tpu.models.backbones.dfm_backbone import (HourglassParams,
                                                       packed_hourglass)
    from dfm_tpu.models.layers import Hourglass
    rng = np.random.RandomState(10)
    x = rng.randn(D, H, W, 32).astype(np.float32)
    hg = Hourglass(32, ndim=3, norm='gn')
    vh = hg.init(jax.random.PRNGKey(1), jnp.asarray(x)[None])
    res, _, _ = hg.apply(vh, jnp.asarray(x)[None])
    ref = np.asarray(x + res[0])

    # graft the dense hourglass's params onto the holder tree (they
    # are interchangeable by construction)
    hp = HourglassParams(32).apply({'params': vh['params']})
    pv = pack_vol_ref(jnp.asarray(x), phase=0)
    out_pv = packed_hourglass(pv, hp, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(out_pv)), ref,
                               atol=2e-3, rtol=1e-3)


def test_backbone_packed_hg_vs_dense(monkeypatch):
    """Integrated DfMBackbone with the FULL packed chain (stem +
    hourglass + pred) == dense path."""
    from dfm_tpu.models.backbones.dfm_backbone import DfMBackbone
    rng = np.random.RandomState(11)
    b, hf, wf, c = 1, 64, 64, 32
    d = 8
    cur = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    prev = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    depths = jnp.linspace(2.0, 10.0, d)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 50.0
    cam[0, 2], cam[1, 2] = wf / 2, hf / 2
    cam2img = jnp.tile(jnp.asarray(cam)[None], (b, 1, 1))
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 3] = 0.3
    cur2prev = jnp.tile(jnp.asarray(c2p)[None], (b, 1, 1))

    def run():
        mdl = DfMBackbone(in_channels=c, cv_channels=32,
                          cost_sample_factor=4, num_depth_bins_out=d,
                          norm='gn', dtype=jnp.bfloat16)
        v = mdl.init(jax.random.PRNGKey(0), cur, prev, depths, cam2img,
                     cur2prev)
        out = mdl.apply(v, cur, prev, depths, cam2img, cur2prev)
        return [np.asarray(o, np.float32) for o in out]

    monkeypatch.setenv('DFM_PACKED', '0')
    dense = run()
    monkeypatch.setenv('DFM_PACKED', 'interpret')
    monkeypatch.setenv('DFM_PACKED_HG', '1')
    packd = run()
    for a, b_ in zip(dense, packd):
        assert a.shape == b_.shape
        np.testing.assert_allclose(a, b_, atol=0.15, rtol=0.15)


def test_grouped_convgn3d_matches_convnorm_pool():
    """grouped_convgn3d == ConvNorm(gn, per-channel) + z-pool on the
    same params (frustum voxel-conv fusion; models/layers.py)."""
    import flax.linen as nn
    from dfm_tpu.models.layers import ConvNorm, grouped_convgn3d
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 8, 16, 32, 64).astype(np.float32))
    cn = ConvNorm(32, (3, 3, 3), norm='gn')
    v = cn.init(jax.random.PRNGKey(0), x)
    ref = cn.apply(v, x)
    ref = np.asarray(ref.reshape(1, 2, 4, 16, 32, 32).mean(axis=2))
    k = v['params']['Conv_0']['kernel']
    sc = v['params']['GroupNorm_0']['scale']
    bs = v['params']['GroupNorm_0']['bias']
    out = grouped_convgn3d(x, k, sc, bs, pool_z=4, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
    # grouped GN (4 channels/group) against a GroupNorm(8) ConvNorm
    cn8 = ConvNorm(32, (3, 3, 3), norm='gn', groups=8)
    ref8 = cn8.apply(v, x)
    out8 = grouped_convgn3d(x, k, sc, bs, pool_z=1, num_groups=8)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               atol=2e-5)


def test_packed_hourglass_weighted_vs_red_hourglass():
    """packed_hourglass(mults) + pred exit == RedHourglass + weighted
    pred ConvNorm on identical params (multiplicity-weighted GroupNorm
    semantics of the reduced-depth mono branch; ops/reduced_depth.py)."""
    from dfm_tpu.models.backbones.dfm_backbone import (
        HourglassParams, RedConvNorm, RedHourglass, packed_hourglass)

    class _Plan:
        def __init__(self, mults):
            self._m = mults

        def mult(self, scale):
            return self._m[scale]

    rng = np.random.RandomState(12)
    x = rng.randn(D, H, W, 32).astype(np.float32)
    m0 = rng.randint(1, 7, size=D).astype(np.float32)
    m1 = rng.randint(1, 7, size=D // 2).astype(np.float32)
    m2 = rng.randint(1, 7, size=D // 4).astype(np.float32)
    plan = _Plan({0: m0, 1: m1, 2: m2})

    red = RedHourglass(32)
    vh = red.init(jax.random.PRNGKey(2), jnp.asarray(x)[None], plan)
    res = red.apply(vh, jnp.asarray(x)[None], plan)
    ref = np.asarray(x + res[0])
    pred = RedConvNorm(32)
    vp = pred.init(jax.random.PRNGKey(3), jnp.asarray(ref)[None], m0)
    ref_pred = np.asarray(pred.apply(vp, jnp.asarray(ref)[None], m0)[0])

    hp = HourglassParams(32).apply({'params': vh['params']})
    pv = pack_vol_ref(jnp.asarray(x), phase=0)
    out_pv = packed_hourglass(pv, hp, mults=(m0, m1, m2),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_vol_ref(out_pv)), ref,
                               atol=2e-3, rtol=1e-3)

    # pred ConvNorm on the packed chain with the weighted exit
    kp = vp['params']['Conv_0']['kernel']
    sp = vp['params']['GroupNorm_0']['scale']
    bp = vp['params']['GroupNorm_0']['bias']
    up, psp = conv_p2p(out_pv, kp, interpret=True)
    pf = unpack_affine_res(up, psp, sp, bp, 32, relu=True, zw=m0,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(pf), ref_pred, atol=2e-3,
                               rtol=1e-3)


def test_backbone_packed_mono_vs_red(monkeypatch):
    """Integrated DfMBackbone at a depth deep enough for a real
    ReducedPlan (d=48 -> dr=44): packed mono chain == RedHourglass
    reduced path."""
    from dfm_tpu.models.backbones.dfm_backbone import DfMBackbone
    rng = np.random.RandomState(13)
    b, hf, wf, c = 1, 64, 64, 32
    d = 48
    cur = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    prev = jnp.asarray(rng.randn(b, hf, wf, c).astype(np.float32))
    depths = jnp.linspace(2.0, 20.0, d)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 50.0
    cam[0, 2], cam[1, 2] = wf / 2, hf / 2
    cam2img = jnp.tile(jnp.asarray(cam)[None], (b, 1, 1))
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 3] = 0.3
    cur2prev = jnp.tile(jnp.asarray(c2p)[None], (b, 1, 1))

    def run():
        mdl = DfMBackbone(in_channels=c, cv_channels=32,
                          cost_sample_factor=4, num_depth_bins_out=d,
                          norm='gn', dtype=jnp.bfloat16)
        v = mdl.init(jax.random.PRNGKey(0), cur, prev, depths, cam2img,
                     cur2prev)
        out = mdl.apply(v, cur, prev, depths, cam2img, cur2prev)
        return [np.asarray(o, np.float32) for o in out]

    monkeypatch.setenv('DFM_PACKED', 'interpret')
    monkeypatch.setenv('DFM_PACKED_MONO', '0')
    red_path = run()
    monkeypatch.setenv('DFM_PACKED_MONO', '1')
    packd = run()
    for a, b_ in zip(red_path, packd):
        assert a.shape == b_.shape
        np.testing.assert_allclose(a, b_, atol=0.15, rtol=0.15)


test_backbone_packed_mono_vs_red = pytest.mark.slow(
    test_backbone_packed_mono_vs_red)
