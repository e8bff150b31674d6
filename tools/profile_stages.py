"""Whole-model stage profile on the real chip (chained timing).

Times each DfM stage at production shapes with real weights, bf16,
by running the full model up to a tap point and differencing. Simpler
and more robust: time isolated stage callables with realistic inputs.

Usage: python tools/profile_stages.py [stage ...]
Stages: backbone neck cost stereo_trunk frustum bev head full
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
    from dfm_tpu.models import BatchMeta, DfM, DfMConfig, dfm_predict

    stages = sys.argv[1:] or ['full']
    cfg = DfMConfig()
    model = DfM(cfg=cfg, dtype=jnp.bfloat16)
    b, h, w = 1, 320, 1280
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, 2, h, w, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 721.5
    cam[0, 2] = w / 2
    cam[1, 2] = h / 2
    meta = BatchMeta.identity(b, jnp.tile(jnp.asarray(cam)[None], (b, 1, 1)))
    meta = dataclasses.replace(meta, org_w=jnp.full((b,), 1242.0))
    variables = jax.jit(
        lambda r: model.init(r, img, meta, train=False))(jax.random.PRNGKey(0))

    from dfm_tpu.models.backbones.dfm_backbone import DfMBackbone
    from dfm_tpu.models.backbones.liga_resnet import LIGAResNet
    from dfm_tpu.models.necks.frustum_to_voxel import FrustumToVoxel
    from dfm_tpu.models.necks.spp_unet import SPPUNetNeck

    d = cfg.num_downsampled_bins
    hq, wq = 80, 320
    stereo_full = jnp.asarray(rng.randn(1, h, w, 32).astype(np.float32)
                              ).astype(jnp.bfloat16)
    vol = jnp.asarray(rng.randn(1, d, hq, wq, 32).astype(np.float32)
                      ).astype(jnp.bfloat16)
    cost = jnp.asarray(rng.randn(1, d, hq, wq).astype(np.float32)
                       ).astype(jnp.bfloat16)
    sem = jnp.asarray(rng.randn(1, hq, wq, 32).astype(np.float32)
                      ).astype(jnp.bfloat16)

    for s in stages:
        if s == 'full':
            def f(variables, img):
                out = model.apply(variables, img, meta, train=False)
                det = dfm_predict(out, cfg)
                return det['scores']
            t = chain_time(f, (variables, img))
        elif s == 'backbone':
            bb = LIGAResNet(depth=cfg.backbone_depth, norm='bn',
                            dtype=jnp.bfloat16)
            cur = img[:, 0].astype(jnp.bfloat16)
            v = bb.init(jax.random.PRNGKey(0), cur)
            def f(v, cur):
                return bb.apply(v, cur)[-1]
            t = chain_time(f, (v, cur)) * 2  # two frames
        elif s == 'neck':
            bb = LIGAResNet(depth=cfg.backbone_depth, norm='bn',
                            dtype=jnp.bfloat16)
            cur = img[:, 0].astype(jnp.bfloat16)
            vb = bb.init(jax.random.PRNGKey(0), cur)
            feats = [cur] + list(bb.apply(vb, cur))
            nk = SPPUNetNeck(sem_channels=cfg.sem_channels,
                             stereo_channels=cfg.stereo_channels,
                             norm='gn', dtype=jnp.bfloat16)
            vn = nk.init(jax.random.PRNGKey(0), feats)
            def f(vn, *feats):
                return nk.apply(vn, list(feats))[0]
            t = chain_time(f, (vn, *feats)) * 2
        elif s == 'stereo_trunk':
            sb = DfMBackbone(in_channels=32, cv_channels=cfg.cv_channels,
                             cost_sample_factor=cfg.cost_sample_factor,
                             num_depth_bins_out=d, norm='gn',
                             dtype=jnp.bfloat16)
            depths = jnp.asarray(cfg.downsampled_depths())
            vs = sb.init(jax.random.PRNGKey(0), stereo_full, stereo_full,
                         depths, meta.ori_cam2img, meta.cur2prev,
                         org_w=meta.org_w, flip=meta.flip,
                         crop_offset=meta.crop_offset,
                         scale_factor=meta.scale_factor)
            def f(vs, a, b_):
                o = sb.apply(vs, a, b_, depths, meta.ori_cam2img,
                             meta.cur2prev, org_w=meta.org_w, flip=meta.flip,
                             crop_offset=meta.crop_offset,
                             scale_factor=meta.scale_factor)
                return o[0]
            t = chain_time(f, (vs, stereo_full, stereo_full))
        elif s == 'frustum':
            fr = FrustumToVoxel(out_channels=cfg.cv_channels,
                                depth_min=cfg.depth_min,
                                depth_max=cfg.depth_max,
                                up_factor=cfg.depth_downsample, norm='gn',
                                dtype=jnp.bfloat16)
            coors = cfg.coordinates_3d()
            vf = fr.init(jax.random.PRNGKey(0), vol, cost, sem, coors,
                         meta.cam2img, (h, w))
            def f(vf, vol, cost, sem):
                return fr.apply(vf, vol, cost, sem, coors, meta.cam2img,
                                (h, w))
            t = chain_time(f, (vf, vol, cost, sem))
        elif s == 'cost_bf16':
            from dfm_tpu.ops.cost_volume import build_plane_sweep_cost
            depths = jnp.asarray(cfg.downsampled_depths())
            def f(a, b_):
                return build_plane_sweep_cost(
                    a, b_, depths, meta.ori_cam2img, meta.cur2prev,
                    cost_sample_factor=cfg.cost_sample_factor,
                    feat_sample_factor=1, org_w=meta.org_w, flip=meta.flip,
                    crop_offset=meta.crop_offset,
                    scale_factor=meta.scale_factor)
            t = chain_time(f, (stereo_full, stereo_full))
        elif s in ('dres0', 'dres1', 'hourglass', 'pred', 'convt3d'):
            from dfm_tpu.models.layers import (ConvNorm, ConvTransposeNorm,
                                               Hourglass)
            from dfm_tpu.models.backbones.dfm_backbone import \
                DepthPredModule
            cost64 = jnp.concatenate([vol, vol], -1)
            if s == 'dres0':
                mod = ConvNorm(32, (3, 3, 3), norm='gn',
                               dtype=jnp.bfloat16)
                x = cost64
            elif s == 'dres1':
                mod = ConvNorm(32, (3, 3, 3), norm='gn', act=False,
                               dtype=jnp.bfloat16)
                x = vol
            elif s == 'hourglass':
                mod = Hourglass(32, ndim=3, norm='gn', dtype=jnp.bfloat16)
                x = vol
            elif s == 'pred':
                mod = DepthPredModule(32, 'gn', jnp.bfloat16)
                x = vol
            else:
                mod = ConvTransposeNorm(32, ndim=3, norm='gn',
                                        dtype=jnp.bfloat16)
                x = vol[:, ::2, ::2, ::2]
            v = mod.init(jax.random.PRNGKey(0), x)
            def f(v, x):
                out = mod.apply(v, x)
                return out[0] if isinstance(out, tuple) else out
            t = chain_time(f, (v, x))
        else:
            print(f'{s}: unknown stage', file=sys.stderr)
            continue
        print(f'{s}: {t * 1e3:.2f} ms')


if __name__ == '__main__':
    main()
