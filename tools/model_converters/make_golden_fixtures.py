#!/usr/bin/env python
"""Generate golden-activation parity fixtures from the REFERENCE's own
torch modules on CPU at reduced shapes.

The strongest parity evidence available without released checkpoints
(none exist in this image): load the reference's `DfMBackbone`
(mmdet3d/models/backbones/dfm_backbone.py:15-214) directly from
/root/reference via importlib with a minimal mmcv/mmdet shim (the repo
has no mmcv), seed its weights deterministically, run one forward at
reduced shapes, and save (inputs, state_dict, outputs) as an npz
fixture. tests/test_golden_parity.py then imports the state_dict
through the repo's torch->flax key map (utils/checkpoint_import.py)
and asserts the dfm_tpu DfMBackbone reproduces the reference's
activations.

The shim provides only structural scaffolding (ConvModule =
conv+GN+ReLU with mmcv's child names, BaseModule = nn.Module, no-op
registries); ALL model math runs in the reference's own code.

Usage: python tools/model_converters/make_golden_fixtures.py \
    [out_dir (default tests/data)]
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = os.environ.get('DFM_REFERENCE_ROOT', '/root/reference')


def _shim_modules():
    import torch
    import torch.nn as nn

    class ConvModule(nn.Module):
        """mmcv ConvModule subset: conv + optional GN + default ReLU,
        with mmcv's child names ('conv', 'gn') so state_dict keys
        match the real thing."""

        def __init__(self, in_c, out_c, kernel_size, stride=1,
                     padding=0, dilation=1, conv_cfg=None, norm_cfg=None,
                     act_cfg='default', **kw):
            super().__init__()
            is3d = bool(conv_cfg) and conv_cfg.get('type') == 'Conv3d'
            conv = nn.Conv3d if is3d else nn.Conv2d
            self.with_norm = norm_cfg is not None
            self.conv = conv(in_c, out_c, kernel_size, stride, padding,
                             dilation=dilation, bias=not self.with_norm)
            if self.with_norm:
                assert norm_cfg['type'] == 'GN', norm_cfg
                self.gn = nn.GroupNorm(norm_cfg['num_groups'], out_c)
            self.with_act = act_cfg is not None

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.gn(x)
            if self.with_act:
                x = torch.relu(x)
            return x

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

        def init_weights(self):
            pass

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mmcv = mod('mmcv')
    mmcv.cnn = mod('mmcv.cnn', ConvModule=ConvModule)
    mmcv.runner = mod('mmcv.runner', BaseModule=BaseModule)
    builder = mod('mmdet.models.builder', BACKBONES=_Registry(),
                  NECKS=_Registry())
    mmdet_models = mod('mmdet.models', builder=builder,
                       NECKS=builder.NECKS, BACKBONES=builder.BACKBONES)
    mmdet = mod('mmdet')
    mmdet.models = mmdet_models

    def loadfile(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    ac = loadfile('_ref_array_converter',
                  f'{REF}/mmdet3d/core/utils/array_converter.py')
    mmdet3d = mod('mmdet3d')
    core = mod('mmdet3d.core')
    core.utils = mod('mmdet3d.core.utils',
                     array_converter=ac.array_converter)
    box_utils = loadfile('_ref_box_utils',
                         f'{REF}/mmdet3d/core/bbox/structures/utils.py')
    core.bbox = mod('mmdet3d.core.bbox',
                    points_cam2img=box_utils.points_cam2img,
                    points_img2cam=box_utils.points_img2cam)
    models = mod('mmdet3d.models')
    cm = loadfile('_ref_conv_modules',
                  f'{REF}/mmdet3d/models/utils/conv_modules.py')
    models.utils = mod('mmdet3d.models.utils', hourglass=cm.hourglass,
                       upconv_module=cm.upconv_module, convbn=cm.convbn,
                       convbn_3d=cm.convbn_3d)
    mmdet3d.core = core
    mmdet3d.models = models
    return loadfile('_ref_dfm_backbone',
                    f'{REF}/mmdet3d/models/backbones/dfm_backbone.py')


def _seed_weights(model, seed=0):
    import torch
    rs = np.random.RandomState(seed)
    sd = model.state_dict()
    for name in sorted(sd.keys()):
        t = sd[name]
        shape = tuple(t.shape)
        if name.endswith('.weight') and t.ndim >= 2:   # conv kernels
            fan_in = int(np.prod(shape[1:]))
            w = rs.randn(*shape) * (0.5 / np.sqrt(fan_in))
        elif 'gn' in name and name.endswith('.weight'):
            w = 1.0 + 0.05 * rs.randn(*shape)
        else:                                          # biases / 1d
            w = 0.02 * rs.randn(*shape)
        # round through f16: the fixture stores f16 (size) and BOTH
        # sides then compute from identical values
        sd[name] = torch.as_tensor(w.astype(np.float16).astype(np.float32),
                                   dtype=t.dtype)
    model.load_state_dict(sd)
    return {k: v.numpy().astype(np.float16)
            for k, v in model.state_dict().items()}


def make_dfm_backbone_fixture(out_path, seed=0):
    import torch
    ref = _shim_modules()
    torch.manual_seed(seed)
    d, h, w, c = 8, 32, 64, 32
    model = ref.DfMBackbone(
        in_channels=c, num_hg=1, cost_sample_factor=4,
        feat_sample_factor=1, cv_channels=32,
        depth_cfg=dict(mode='UD', num_bins=4 * d, depth_min=2.0,
                       depth_max=10.0, downsample_factor=4))
    model.eval()
    sd = _seed_weights(model, seed)
    depths = np.asarray(
        [(i + 0.5) * 4 * (10.0 - 2.0) / (4 * d) + 2.0
         for i in range(d)], np.float32)
    model.downsampled_depth = torch.as_tensor(depths)

    rs = np.random.RandomState(seed + 1)
    cur = rs.randn(1, c, h, w).astype(np.float32)
    prev = rs.randn(1, c, h, w).astype(np.float32)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 50.0
    cam[0, 2], cam[1, 2] = w / 2, h / 2
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 3] = 0.3
    c2p[2, 3] = -0.1

    out = {'cur': cur, 'prev': prev, 'depths': depths, 'cam2img': cam,
           'cur2prev': c2p}
    for k, v in sd.items():
        out[f'sd.{k}'] = v

    variants = [
        dict(tag='id', flip=False, crop=(0.0, 0.0), scale=1.0,
             ori_shape=(h, w)),
        dict(tag='aug', flip=True, crop=(6.0, 2.0), scale=0.5,
             ori_shape=(2 * h + 10, 2 * w + 20)),
    ]
    for vr in variants:
        img_meta = dict(
            ori_cam2img=cam.tolist(),
            cur2prevs=torch.as_tensor(c2p[None]),
            ori_shape=vr['ori_shape'],
            flip=vr['flip'],
            crop_offset=list(vr['crop']),
            scale_factor=[vr['scale']],
            pad_shape=(h, w),
        )
        with torch.no_grad():
            cost, stereo, mono = model(
                torch.as_tensor(cur), torch.as_tensor(prev), [img_meta])
        t = vr['tag']
        out[f'{t}.flip'] = np.float32(vr['flip'])
        out[f'{t}.crop_offset'] = np.asarray(vr['crop'], np.float32)
        out[f'{t}.scale_factor'] = np.float32(vr['scale'])
        out[f'{t}.org_w'] = np.float32(vr['ori_shape'][1])
        out[f'{t}.cost'] = cost.numpy()
        out[f'{t}.stereo'] = stereo.numpy()
        out[f'{t}.mono'] = mono.numpy()
    np.savez_compressed(out_path, **out)
    size = os.path.getsize(out_path) / 1e6
    print(f'wrote {out_path} ({size:.2f} MB)')


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else 'tests/data'
    os.makedirs(out_dir, exist_ok=True)
    make_dfm_backbone_fixture(
        os.path.join(out_dir, 'golden_dfm_backbone.npz'))


if __name__ == '__main__':
    main()
