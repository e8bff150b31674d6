"""Convert a reference SECOND-teacher torch checkpoint to dfm_tpu.

Equivalent of the reference's
`tools/model_converters/convert_second_checkpoints.py` (remaps a LIGA
SECOND checkpoint's keys into the DfM teacher's `lidar_model.*`
namespace). Here the target is the flax `SparseLidarTeacher` /
`LidarTeacher` parameter tree; layer-level weight layout conversions
come from dfm_tpu/utils/torch_convert.py.

Usage: python tools/model_converters/convert_second_checkpoints.py \
           SRC.pth DST.msgpack [--encoder sparse|dense]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def convert_sparse_encoder(sd, prefix='middle_encoder.'):
    """Map CustomSparseEncoder torch keys -> SparseEncoder05 params.

    torch spconv weights are (kz, ky, kx, C_in, C_out) (spconv v2) or
    (C_out, C_in, kz, ky, kx); both reshape to the tap-major
    (27, C_in, C_out) layout of ops/sparse_conv.subm_conv.
    """
    def w(key):
        t = np.asarray(sd[prefix + key])
        if t.ndim == 5 and t.shape[0] == t.shape[1] == t.shape[2] == 3:
            k = t.reshape(27, t.shape[3], t.shape[4])
        elif t.ndim == 5:  # (Cout, Cin, kz, ky, kx)
            k = t.transpose(2, 3, 4, 1, 0).reshape(27, t.shape[1],
                                                   t.shape[0])
        else:
            raise ValueError(f'{key}: {t.shape}')
        return k

    def bn(key):
        return dict(
            scale=np.asarray(sd[prefix + key + '.weight']),
            bias=np.asarray(sd[prefix + key + '.bias']))

    def bn_stats(key):
        return dict(
            mean=np.asarray(sd[prefix + key + '.running_mean']),
            var=np.asarray(sd[prefix + key + '.running_var']))

    params = {
        'conv_input': {'kernel': w('conv_input.0.weight')},
        'bn_input': bn('conv_input.1'),
        'enc0_0': {'kernel': w('encoder_layers.encoder_layer1.0.0.weight')},
        'bn0_0': bn('encoder_layers.encoder_layer1.0.1'),
    }
    stats = {'bn_input': bn_stats('conv_input.1'),
             'bn0_0': bn_stats('encoder_layers.encoder_layer1.0.1')}
    for s in (1, 2, 3):
        lay = f'encoder_layers.encoder_layer{s + 1}'
        params[f'enc{s}_down'] = {'kernel': w(f'{lay}.0.0.weight')}
        params[f'bn{s}_down'] = bn(f'{lay}.0.1')
        stats[f'bn{s}_down'] = bn_stats(f'{lay}.0.1')
        for j in (1, 2):
            params[f'enc{s}_{j}'] = {'kernel': w(f'{lay}.{j}.0.weight')}
            params[f'bn{s}_{j}'] = bn(f'{lay}.{j}.1')
            stats[f'bn{s}_{j}'] = bn_stats(f'{lay}.{j}.1')
    cw = np.asarray(sd[prefix + 'conv_out.0.weight'])
    if cw.ndim == 5:
        cw = cw.reshape(1, cw.shape[-2], cw.shape[-1]) if \
            cw.shape[0] == 1 else cw.transpose(2, 3, 4, 1, 0).reshape(
                1, cw.shape[1], cw.shape[0])
    params['conv_out'] = {'kernel': cw}
    return params, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--encoder', default='sparse',
                   choices=['sparse', 'dense'])
    args = p.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.src, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v
          for k, v in sd.items()}
    # strip the DfM wrapper prefix if present
    if any(k.startswith('lidar_model.') for k in sd):
        sd = {k[len('lidar_model.'):]: v for k, v in sd.items()
              if k.startswith('lidar_model.')}

    if args.encoder != 'sparse':
        raise SystemExit('dense teacher import: use '
                         'dfm_tpu.utils.checkpoint_import mappings')
    enc_params, enc_stats = convert_sparse_encoder(sd)

    # BEV hourglass through the generic key-map importer (needs a
    # variables template from a model init on dummy inputs)
    import jax
    import jax.numpy as jnp
    from dfm_tpu.models.detectors.teacher import SparseLidarTeacher
    from dfm_tpu.utils.checkpoint_import import (import_dfm_state_dict,
                                                 teacher_key_map)
    t = SparseLidarTeacher()
    pts = jnp.zeros((1, 64, 3))
    var = jax.jit(lambda: t.init(jax.random.PRNGKey(0), pts,
                                 jnp.ones((1, 64), bool)))()
    var = import_dfm_state_dict(sd, var, key_map=teacher_key_map(),
                                strict=False)
    tree = jax.tree.map(np.asarray, var)
    tree['params']['middle_encoder'] = enc_params
    for k, v in enc_stats.items():
        tree.setdefault('batch_stats', {}).setdefault(
            'middle_encoder', {})[k] = v
    with open(args.dst, 'wb') as f:
        f.write(msgpack_serialize(tree))
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
