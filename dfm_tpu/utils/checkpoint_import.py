"""Full-model torch -> flax checkpoint importer for DfM.

Maps the reference's mmdet3d-style DfM state_dict (the output of
tools/model_converters/convert_dfm_checkpoints.py — top-level modules
backbone / neck / backbone_stereo / feature_transformation /
backbone_3d / bbox_head_3d, reference detectors/dfm.py:21-109) onto the
dfm_tpu flax parameter tree, so released checkpoints can be evaluated
for numerical parity.

Key-structure sources (reference):
  * LIGAResNet: mmdet ResNet naming — conv1/bn1, layerL.B.{conv1,bn1,
    conv2,bn2,downsample.0,downsample.1} (backbones/liga_resnet.py).
  * SPPUNetNeck: spp_branches.i.1.{conv,gn}, upconv_module.{conv,redir}
    .s.{0,1}, lastconv.{0.conv,0.gn,1}, rpnconv.{0,1}.{conv,gn}
    (necks/spp_unet_neck.py:35-91).
  * DfMBackbone: dres0/dres1[_mono].{conv,gn}, hg_{stereo,mono}.k.
    conv1..conv6 (utils/conv_modules.py:73-140 hourglass),
    pred_{stereo,mono}.k.{0.conv,0.gn,1}, aggregate_cost
    (backbones/dfm_backbone.py:50-128).
  * FrustumToVoxel: voxel_convs.i.0.{conv,gn}
    (necks/feature_transformation.py:51-64).
  * BEVHourglass: compress_conv.{conv,norm}, bev_hourglass.conv1..conv6
    (backbones/bev_hourglass.py:24-137).
  * LIGAAnchor3DHead: cls_convs.i.{conv,norm}, reg_convs.i, conv_cls,
    conv_reg, conv_dir_cls (dense_heads/liga_anchor3d_head.py:37-79).

Weight layout conversions:
  torch Conv2d (O,I,kH,kW)            -> flax (kH,kW,I,O)
  torch Conv3d (O,I,kD,kH,kW)         -> flax (kD,kH,kW,I,O)
  torch ConvTranspose2d (I,O,kH,kW)   -> flax ConvTranspose
      kernel[kh,kw,i,o] = w[i,o,KH-1-kh,KW-1-kw]  (spatial flip: torch
      transposed conv convolves the dilated input with the flipped
      kernel; flax ConvTranspose correlates)
  torch ConvTranspose3d analogous.
  BN weight/bias -> params scale/bias; running stats -> batch_stats.
"""

import numpy as np

__all__ = ['dfm_key_map', 'import_dfm_state_dict',
           'expected_torch_shapes', 'load_msgpack_tree']


def load_msgpack_tree(path):
    """Read a flax-msgpack param tree (the format written by
    tools/model_converters/convert_second_checkpoints.py and
    publish_model.py) back into nested dicts of numpy arrays."""
    from flax.serialization import msgpack_restore
    with open(path, 'rb') as f:
        return msgpack_restore(f.read())


def _np(t):
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv2d_kernel(w):
    return _np(w).transpose(2, 3, 1, 0)


def conv3d_kernel(w):
    return _np(w).transpose(2, 3, 4, 1, 0)


def convt2d_kernel(w):
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def convt3d_kernel(w):
    return _np(w)[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1).copy()


# entry kinds: how a torch module prefix maps into flax leaves.
#   conv2d/conv3d:   <p>.weight [+ .bias]        -> Conv kernel/bias
#   convt2d/convt3d: <p>.weight                  -> ConvTranspose kernel
#   gn:              <p>.{weight,bias}           -> GroupNorm scale/bias
#   bn:              <p>.{weight,bias,running_*} -> BatchNorm + stats


def _convnorm(prefix, fpath, ndim, norm='gn'):
    """mmcv ConvModule (conv + norm) -> flax ConvNorm."""
    kind = f'conv{ndim}d'
    nname = 'gn' if norm == 'gn' else 'bn'
    return [(f'{prefix}.conv', fpath + ('Conv_0',), kind),
            (f'{prefix}.{nname}', fpath + (_norm_mod(norm),), norm)]


def _convbn(prefix, fpath, ndim, norm='gn'):
    """reference convbn/convbn_3d Sequential(conv, norm)."""
    kind = f'conv{ndim}d'
    return [(f'{prefix}.0', fpath + ('Conv_0',), kind),
            (f'{prefix}.1', fpath + (_norm_mod(norm),), norm)]


def _norm_mod(norm):
    return 'GroupNorm_0' if norm == 'gn' else 'BatchNorm_0'


def _hourglass(prefix, fpath, ndim, norm='gn'):
    """reference hourglass / hourglass2d -> flax Hourglass."""
    out = []
    out += _convbn(f'{prefix}.conv1.0', fpath + ('ConvNorm_0',), ndim, norm)
    out += _convbn(f'{prefix}.conv2', fpath + ('ConvNorm_1',), ndim, norm)
    out += _convbn(f'{prefix}.conv3.0', fpath + ('ConvNorm_2',), ndim, norm)
    out += _convbn(f'{prefix}.conv4.0', fpath + ('ConvNorm_3',), ndim, norm)
    for i, conv in ((0, 'conv5'), (1, 'conv6')):
        out += [(f'{prefix}.{conv}.0',
                 fpath + (f'ConvTransposeNorm_{i}', 'ConvTranspose_0'),
                 f'convt{ndim}d'),
                (f'{prefix}.{conv}.1',
                 fpath + (f'ConvTransposeNorm_{i}', _norm_mod(norm)), norm)]
    return out


def _resnet_basic(prefix, fpath, with_downsample):
    out = [(f'{prefix}.conv1', fpath + ('Conv_0',), 'conv2d'),
           (f'{prefix}.bn1', fpath + ('BatchNorm_0',), 'bn'),
           (f'{prefix}.conv2', fpath + ('Conv_1',), 'conv2d'),
           (f'{prefix}.bn2', fpath + ('BatchNorm_1',), 'bn')]
    if with_downsample:
        out += [(f'{prefix}.downsample.0', fpath + ('Conv_2',), 'conv2d'),
                (f'{prefix}.downsample.1', fpath + ('BatchNorm_2',), 'bn')]
    return out


def dfm_key_map(num_hg=1, head_num_convs=2, num_3dconvs=1,
                stage_blocks=(3, 4, 6, 3), downsample_stages=(2,),
                upconv_stages=2):
    """(torch_prefix, flax_path, kind) for the DfM-R34 KITTI layout.

    `downsample_stages`: 1-based resnet stages whose block0 has a
    downsample branch (LIGA-R34: only stage 2 changes width/stride).
    """
    m = []
    # backbone: LIGAResNet
    m += [('backbone.conv1', ('backbone', 'Conv_0'), 'conv2d'),
          ('backbone.bn1', ('backbone', 'BatchNorm_0'), 'bn')]
    for li, nblocks in enumerate(stage_blocks, start=1):
        for b in range(nblocks):
            m += _resnet_basic(
                f'backbone.layer{li}.{b}',
                ('backbone', f'layer{li}_block{b}'),
                with_downsample=(b == 0 and li in downsample_stages))
    # neck: SPPUNetNeck
    for i in range(4):
        m += _convnorm(f'neck.spp_branches.{i}.1',
                       ('neck', f'ConvNorm_{i}'), 2)
    for s in range(upconv_stages):
        # reference upconv_module uses convbn with default (Sync)BN
        m += _convbn(f'neck.upconv_module.conv.{s}',
                     ('neck', 'UpconvModule_0', f'ConvNorm_{2 * s}'), 2,
                     norm='bn')
        m += _convbn(f'neck.upconv_module.redir.{s}',
                     ('neck', 'UpconvModule_0', f'ConvNorm_{2 * s + 1}'), 2,
                     norm='bn')
    m += _convnorm('neck.lastconv.0', ('neck', 'ConvNorm_4'), 2)
    m += [('neck.lastconv.1', ('neck', 'Conv_0'), 'conv2d')]
    m += _convnorm('neck.rpnconv.0', ('neck', 'ConvNorm_5'), 2)
    m += _convnorm('neck.rpnconv.1', ('neck', 'ConvNorm_6'), 2)
    # backbone_stereo: DfMBackbone
    bs = ('backbone_stereo',)
    m += _convnorm('backbone_stereo.dres0', bs + ('dres0_stereo',), 3)
    m += _convnorm('backbone_stereo.dres1', bs + ('dres1_stereo',), 3)
    m += _convnorm('backbone_stereo.dres0_mono', bs + ('dres0_mono',), 3)
    m += _convnorm('backbone_stereo.dres1_mono', bs + ('dres1_mono',), 3)
    for k in range(num_hg):
        m += _hourglass(f'backbone_stereo.hg_stereo.{k}',
                        bs + (f'hg_stereo_{k}',), 3)
        m += _hourglass(f'backbone_stereo.hg_mono.{k}',
                        bs + (f'hg_mono_{k}',), 3)
    for tag in ('stereo', 'mono'):
        for k in range(num_hg):
            # flax runs a single pred module (num_hg == 1)
            fp = bs + (f'pred_{tag}',)
            m += _convnorm(f'backbone_stereo.pred_{tag}.{k}.0',
                           fp + ('ConvNorm_0',), 3)
            m += [(f'backbone_stereo.pred_{tag}.{k}.1', fp + ('Conv_0',),
                   'conv3d')]
    m += [('backbone_stereo.aggregate_cost',
           bs + ('aggregate_cost',), 'conv2d')]
    # feature_transformation
    for i in range(num_3dconvs):
        m += _convnorm(f'feature_transformation.voxel_convs.{i}.0',
                       ('feature_transformation', f'voxel_conv{i}'), 3)
    # backbone_3d: BEVHourglass
    m += _convnorm('backbone_3d.compress_conv',
                   ('backbone_3d', 'compress'), 2)
    m += _hourglass('backbone_3d.bev_hourglass', ('backbone_3d', 'hg'), 2)
    # bbox_head_3d: LIGAAnchor3DHead
    h = ('bbox_head_3d',)
    for i in range(head_num_convs):
        m += _convnorm(f'bbox_head_3d.cls_convs.{i}',
                       h + (f'cls_conv{i}',), 2)
        m += _convnorm(f'bbox_head_3d.reg_convs.{i}',
                       h + (f'reg_conv{i}',), 2)
    m += [('bbox_head_3d.conv_cls', h + ('conv_cls',), 'conv2d'),
          ('bbox_head_3d.conv_reg', h + ('conv_reg',), 'conv2d'),
          ('bbox_head_3d.conv_dir_cls', h + ('conv_dir',), 'conv2d')]
    return m


_CONV_FNS = {'conv2d': conv2d_kernel, 'conv3d': conv3d_kernel,
             'convt2d': convt2d_kernel, 'convt3d': convt3d_kernel}


def _set(tree, path, leaf, value, strict_shape=True):
    node = tree
    for k in path:
        if k not in node:
            raise KeyError(f'flax path {path} missing at {k!r}')
        node = node[k]
    if leaf not in node:
        raise KeyError(f'flax leaf {path + (leaf,)} missing')
    if strict_shape and tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(f'shape mismatch at {path + (leaf,)}: '
                         f'{node[leaf].shape} vs {value.shape}')
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def import_dfm_state_dict(state_dict, variables, key_map=None,
                          strict=True):
    """Fill a flax variables template from a torch DfM state_dict.

    Args:
        state_dict: {torch_key: tensor/ndarray}.
        variables: template from model.init (dict with 'params' and
            'batch_stats'); returned structure copies it.
        key_map: from `dfm_key_map` (default: DfM-R34 KITTI).
        strict: raise if any mapped torch key is absent or any flax
            param leaf is never written.

    Returns:
        new variables dict (numpy leaves).
    """
    import jax
    key_map = key_map or dfm_key_map()
    out = jax.tree.map(lambda x: np.asarray(x).copy(), variables)
    written = set()

    def write(section, path, leaf, val):
        _set(out[section], path, leaf, val)
        written.add((section,) + path + (leaf,))

    for prefix, fpath, kind in key_map:
        try:
            if kind in _CONV_FNS:
                w = state_dict[f'{prefix}.weight']
                write('params', fpath, 'kernel', _CONV_FNS[kind](w))
                if f'{prefix}.bias' in state_dict:
                    write('params', fpath, 'bias',
                          _np(state_dict[f'{prefix}.bias']))
            elif kind == 'gn':
                write('params', fpath, 'scale',
                      _np(state_dict[f'{prefix}.weight']))
                write('params', fpath, 'bias',
                      _np(state_dict[f'{prefix}.bias']))
            elif kind == 'bn':
                write('params', fpath, 'scale',
                      _np(state_dict[f'{prefix}.weight']))
                write('params', fpath, 'bias',
                      _np(state_dict[f'{prefix}.bias']))
                write('batch_stats', fpath, 'mean',
                      _np(state_dict[f'{prefix}.running_mean']))
                write('batch_stats', fpath, 'var',
                      _np(state_dict[f'{prefix}.running_var']))
            else:
                raise ValueError(kind)
        except KeyError as e:
            if strict:
                raise KeyError(f'importing {prefix} ({kind}): {e}') from e

    if strict:
        missing = []
        for sect in ('params', 'batch_stats'):
            for p, _ in jax.tree_util.tree_flatten_with_path(
                    out.get(sect, {}))[0]:
                keypath = (sect,) + tuple(k.key for k in p)
                if keypath not in written:
                    missing.append('/'.join(keypath))
        if missing:
            raise ValueError(
                f'{len(missing)} flax leaves not covered by the '
                f'checkpoint: {missing[:10]}...')
    return out


def expected_torch_shapes(variables, key_map=None):
    """Torch-side {key: shape} implied by a flax template — used to
    synthesize layout-faithful state_dicts in tests."""
    import jax
    key_map = key_map or dfm_key_map()
    flat = {}
    for sect in ('params', 'batch_stats'):
        for p, v in jax.tree_util.tree_flatten_with_path(
                variables.get(sect, {}))[0]:
            flat[(sect,) + tuple(k.key for k in p)] = tuple(v.shape)
    shapes = {}
    for prefix, fpath, kind in key_map:
        if kind in ('conv2d', 'conv3d'):
            s = flat[('params',) + fpath + ('kernel',)]
            n = len(s)
            shapes[f'{prefix}.weight'] = (s[-1], s[-2]) + s[:n - 2]
            if ('params',) + fpath + ('bias',) in flat:
                shapes[f'{prefix}.bias'] = (s[-1],)
        elif kind in ('convt2d', 'convt3d'):
            s = flat[('params',) + fpath + ('kernel',)]
            n = len(s)
            shapes[f'{prefix}.weight'] = (s[-2], s[-1]) + s[:n - 2]
        elif kind == 'gn':
            s = flat[('params',) + fpath + ('scale',)]
            shapes[f'{prefix}.weight'] = s
            shapes[f'{prefix}.bias'] = s
        elif kind == 'bn':
            s = flat[('params',) + fpath + ('scale',)]
            shapes[f'{prefix}.weight'] = s
            shapes[f'{prefix}.bias'] = s
            shapes[f'{prefix}.running_mean'] = s
            shapes[f'{prefix}.running_var'] = s
    return shapes


def teacher_key_map(norm='bn'):
    """Key map for the LiDAR teacher's BEVHourglass
    (reference backbones/bev_hourglass.py: compress_conv Sequential +
    bev_hourglass; teacher config uses SyncBN -> 'bn'). Paths are
    relative to a SparseLidarTeacher/LidarTeacher variables tree
    (flax names 'bev' -> {compress, hg})."""
    m = []
    m += _convnorm('backbone.compress_conv', ('bev', 'compress'), 2, norm)
    m += _hourglass('backbone.bev_hourglass', ('bev', 'hg'), 2, norm)
    return m
