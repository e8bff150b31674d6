"""Ablation profile of the DfM stereo trunk at production shapes.

Times each trunk piece as it ACTUALLY runs inside the model (split
cost build, packed stem, hourglass stack, mono branch, pred modules,
gate) — profile_stages.py's generic sub-stages time the dense modules,
which the banded/packed trunk no longer uses.

Usage: python tools/profile_trunk.py [piece ...]
Pieces: cost_split stem_packed hg_stereo mono pred_stereo pred_mono
        gate trunk_all
"""

import dataclasses
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from dfm_tpu.models import BatchMeta, DfMConfig
    from dfm_tpu.models.backbones import dfm_backbone as dbb
    from dfm_tpu.ops.cost_volume import build_plane_sweep_cost

    pieces = sys.argv[1:] or ['cost_split', 'stem_packed', 'hg_stereo',
                              'mono', 'pred_stereo', 'pred_mono', 'gate']
    cfg = DfMConfig()
    b, h, w = 1, 320, 1280
    d = cfg.num_downsampled_bins
    hq, wq = h // cfg.cost_sample_factor, w // cfg.cost_sample_factor
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    stereo_full = jnp.asarray(rng.randn(b, h, w, 32).astype(np.float32)
                              ).astype(dt)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 721.5
    cam[0, 2], cam[1, 2] = w / 2, h / 2
    meta = BatchMeta.identity(b, jnp.tile(jnp.asarray(cam)[None],
                                          (b, 1, 1)))
    meta = dataclasses.replace(meta, org_w=jnp.full((b,), 1242.0))
    depths = jnp.asarray(cfg.downsampled_depths())

    cur2d = jnp.asarray(rng.randn(b, hq, wq, 32).astype(np.float32)
                        ).astype(dt)
    vol = jnp.asarray(rng.randn(b, d, hq, wq, 32).astype(np.float32)
                      ).astype(dt)
    volc = jnp.asarray(rng.randn(b, d, hq, wq, 1).astype(np.float32)
                       ).astype(dt)

    sb = dbb.DfMBackbone(in_channels=32, cv_channels=cfg.cv_channels,
                         cost_sample_factor=cfg.cost_sample_factor,
                         num_depth_bins_out=d, norm='gn', dtype=dt)
    vs = sb.init(jax.random.PRNGKey(0), stereo_full, stereo_full, depths,
                 meta.ori_cam2img, meta.cur2prev, org_w=meta.org_w,
                 flip=meta.flip, crop_offset=meta.crop_offset,
                 scale_factor=meta.scale_factor)
    params = vs['params']

    for s in pieces:
        if s == 'cost_split':
            def f(a, b_):
                return build_plane_sweep_cost(
                    a, b_, depths, meta.ori_cam2img, meta.cur2prev,
                    cost_sample_factor=cfg.cost_sample_factor,
                    feat_sample_factor=1, org_w=meta.org_w,
                    flip=meta.flip, crop_offset=meta.crop_offset,
                    scale_factor=meta.scale_factor, split=True)
            t = chain_time(f, (stereo_full, stereo_full))
        elif s == 'stem_packed':
            from dfm_tpu.ops.pallas.conv_chain import pack_vol
            k0 = params['dres0_stereo']['Conv_0']['kernel']
            s0s = params['dres0_stereo']['GroupNorm_0']['scale']
            s0b = params['dres0_stereo']['GroupNorm_0']['bias']
            k1 = params['dres1_stereo']['Conv_0']['kernel']
            s1s = params['dres1_stereo']['GroupNorm_0']['scale']
            s1b = params['dres1_stereo']['GroupNorm_0']['bias']

            def f(cur, prev):
                def one(args):
                    c, p = args
                    pv = pack_vol(p, phase=0)
                    return dbb.packed_stereo_stem(
                        c, pv, k0, (s0s, s0b), k1, (s1s, s1b), 32)
                return jax.lax.cond(
                    jnp.isfinite(prev[0, 0, 0, 0, 0]), one,
                    lambda a: jnp.zeros(prev.shape[1:], prev.dtype),
                    (cur[0], prev[0]))
            t = chain_time(f, (cur2d, vol))
        elif s == 'hg_stereo':
            from dfm_tpu.models.layers import Hourglass
            hg = Hourglass(cfg.cv_channels, ndim=3, norm='gn', dtype=dt)
            vh = {'params': params['hg_stereo_0']}
            def f(x):
                res, _, _ = hg.apply(vh, x)
                return x + res
            t = chain_time(f, (vol,))
        elif s == 'hg_packed':
            from dfm_tpu.ops.pallas.conv_chain import pack_vol, unpack_vol
            hp_tree = params['hg_stereo_0']
            hp = dbb.HourglassParams(cfg.cv_channels).apply(
                {'params': hp_tree})

            def f(x):
                def one(xi):
                    pv = pack_vol(xi, phase=0)
                    out = dbb.packed_hourglass(pv, hp)
                    return unpack_vol(out)
                return jax.lax.cond(
                    jnp.isfinite(x[0, 0, 0, 0, 0]), one,
                    lambda xi: jnp.zeros(xi.shape, xi.dtype), x[0])
            t = chain_time(f, (vol,))
        elif s == 'chain_all':
            from dfm_tpu.ops.pallas.conv_chain import (conv_p2p, pack_vol,
                                                       unpack_affine_res,
                                                       unpack_vol)
            k0 = params['dres0_stereo']['Conv_0']['kernel']
            gn0 = (params['dres0_stereo']['GroupNorm_0']['scale'],
                   params['dres0_stereo']['GroupNorm_0']['bias'])
            k1 = params['dres1_stereo']['Conv_0']['kernel']
            gn1 = (params['dres1_stereo']['GroupNorm_0']['scale'],
                   params['dres1_stereo']['GroupNorm_0']['bias'])
            hp = dbb.HourglassParams(cfg.cv_channels).apply(
                {'params': params['hg_stereo_0']})
            kp = params['pred_stereo']['ConvNorm_0']['Conv_0']['kernel']
            sps = params['pred_stereo']['ConvNorm_0']['GroupNorm_0']['scale']
            spb = params['pred_stereo']['ConvNorm_0']['GroupNorm_0']['bias']

            def f(cur, prev):
                def one(args):
                    c, p = args
                    pv = pack_vol(p, phase=0)
                    x_pv = dbb.packed_stereo_stem(
                        c, pv, k0, gn0, k1, gn1, 32, keep_packed=True)
                    x_pv = dbb.packed_hourglass(x_pv, hp)
                    up, psp = conv_p2p(x_pv, kp)
                    pf = unpack_affine_res(up, psp, sps, spb, 32,
                                           relu=True)
                    return unpack_vol(x_pv), pf
                z = jnp.zeros(prev.shape[1:], prev.dtype)
                return jax.lax.cond(
                    jnp.isfinite(prev[0, 0, 0, 0, 0]), one,
                    lambda a: (z, z), (cur[0], prev[0]))
            t = chain_time(f, (cur2d, vol))
        elif s == 'mono':
            from dfm_tpu.ops.band_volume import band_add, band_from_const
            from dfm_tpu.ops.reduced_depth import make_reduced_plan

            class MonoBranch:
                pass

            def f(cur):
                m0 = dbb.BandConvNorm(cfg.cv_channels, dtype=dt).apply(
                    {'params': params['dres0_mono']},
                    band_from_const(cur, d))
                m1 = dbb.BandConvNorm(cfg.cv_channels, act=False,
                                      dtype=dt).apply(
                    {'params': params['dres1_mono']}, m0)
                mono_band = band_add(m1, m0)
                plan = make_reduced_plan(d, e=mono_band.lo.shape[1])
                red = dbb._assemble_reduced(mono_band, plan)
                res = dbb.RedHourglass(cfg.cv_channels, dtype=dt).apply(
                    {'params': params['hg_mono_0']}, red, plan)
                mono_red = red + res
                mono_cost = dbb.RedDepthPredModule(
                    cfg.cv_channels, dtype=dt).apply(
                    {'params': params['pred_mono']}, mono_red, plan)
                return mono_cost[:, plan.expand_idx]
            t = chain_time(f, (cur2d,))
        elif s == 'mono_packed':
            from dfm_tpu.ops.band_volume import band_add, band_from_const
            from dfm_tpu.ops.pallas.conv_chain import (conv_p2p, pack_vol,
                                                       unpack_affine_res)
            from dfm_tpu.ops.reduced_depth import make_reduced_plan
            plan = make_reduced_plan(d, e=2)
            hpm = dbb.HourglassParams(cfg.cv_channels).apply(
                {'params': params['hg_mono_0']})
            kpm = params['pred_mono']['ConvNorm_0']['Conv_0']['kernel']
            spms = params['pred_mono']['ConvNorm_0']['GroupNorm_0']['scale']
            spmb = params['pred_mono']['ConvNorm_0']['GroupNorm_0']['bias']
            mults = (plan.mult(0), plan.mult(1), plan.mult(2))
            scal = dbb.Conv3DScalar(dtype=dt)
            vsc = {'params': params['pred_mono']['Conv_0']}

            def f(cur):
                m0 = dbb.BandConvNorm(cfg.cv_channels, dtype=dt).apply(
                    {'params': params['dres0_mono']},
                    band_from_const(cur, d))
                m1 = dbb.BandConvNorm(cfg.cv_channels, act=False,
                                      dtype=dt).apply(
                    {'params': params['dres1_mono']}, m0)
                red = dbb._assemble_reduced(band_add(m1, m0), plan)

                def one(red_i):
                    pv = pack_vol(red_i, phase=0)
                    x_pv = dbb.packed_hourglass(pv, hpm, mults=mults)
                    upm, psm = conv_p2p(x_pv, kpm)
                    return unpack_affine_res(upm, psm, spms, spmb, 32,
                                             relu=True, zw=mults[0])
                pf = jax.lax.cond(
                    jnp.isfinite(red[0, 0, 0, 0, 0]), one,
                    lambda r: jnp.zeros(red.shape[1:], red.dtype),
                    red[0])
                cost = scal.apply(vsc, pf[None])
                return cost[:, plan.expand_idx]
            t = chain_time(f, (cur2d,))
        elif s == 'mono_stem':
            from dfm_tpu.ops.band_volume import band_add, band_from_const
            from dfm_tpu.ops.reduced_depth import make_reduced_plan

            def f(cur):
                m0 = dbb.BandConvNorm(cfg.cv_channels, dtype=dt).apply(
                    {'params': params['dres0_mono']},
                    band_from_const(cur, d))
                m1 = dbb.BandConvNorm(cfg.cv_channels, act=False,
                                      dtype=dt).apply(
                    {'params': params['dres1_mono']}, m0)
                mono_band = band_add(m1, m0)
                plan = make_reduced_plan(d, e=mono_band.lo.shape[1])
                return dbb._assemble_reduced(mono_band, plan)
            t = chain_time(f, (cur2d,))
        elif s == 'mono_hg':
            from dfm_tpu.ops.reduced_depth import make_reduced_plan
            plan = make_reduced_plan(d, e=2)
            xr = jnp.asarray(rng.randn(b, plan.dr, hq, wq, 32
                                       ).astype(np.float32)).astype(dt)

            def f(x):
                res = dbb.RedHourglass(cfg.cv_channels, dtype=dt).apply(
                    {'params': params['hg_mono_0']}, x, plan)
                return x + res
            t = chain_time(f, (xr,))
        elif s == 'pred_stereo':
            mod = dbb.DepthPredModule(cfg.cv_channels, 'gn', dt)
            vp = {'params': params['pred_stereo']}
            def f(x):
                return mod.apply(vp, x)
            t = chain_time(f, (vol,))
        elif s == 'pred_mono':
            from dfm_tpu.ops.reduced_depth import make_reduced_plan
            plan = make_reduced_plan(d, e=2)
            dr = plan.dr
            xr = jnp.asarray(rng.randn(b, dr, hq, wq, 32
                                       ).astype(np.float32)).astype(dt)
            mod = dbb.RedDepthPredModule(cfg.cv_channels, dtype=dt)
            vp = {'params': params['pred_mono']}
            def f(x):
                return mod.apply(vp, x, plan)
            t = chain_time(f, (xr,))
        elif s == 'gate':
            import flax.linen as nn
            gate = nn.Conv(d, (1, 1), use_bias=False, dtype=dt)
            vg = {'params': params['aggregate_cost']}
            def f(sc, mc):
                s2d = sc[..., 0].transpose(0, 2, 3, 1)
                m2d = mc[..., 0].transpose(0, 2, 3, 1)
                wgt = gate.apply(vg, jnp.concatenate([s2d, m2d], -1))
                wgt = nn.sigmoid(wgt).transpose(0, 3, 1, 2)[..., None]
                return wgt * sc + (1 - wgt) * mc
            t = chain_time(f, (volc, volc))
        elif s == 'trunk_all':
            def f(a, b_):
                o = sb.apply(vs, a, b_, depths, meta.ori_cam2img,
                             meta.cur2prev, org_w=meta.org_w,
                             flip=meta.flip, crop_offset=meta.crop_offset,
                             scale_factor=meta.scale_factor)
                return o[0]
            t = chain_time(f, (stereo_full, stereo_full))
        else:
            print(f'{s}: unknown piece', file=sys.stderr)
            continue
        print(f'{s}: {t * 1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
