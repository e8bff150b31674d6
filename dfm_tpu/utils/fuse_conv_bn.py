"""Fold BatchNorm running statistics into preceding convolutions.

Equivalent of the reference's tools/misc/fuse_conv_bn.py (mmcv
fuse_conv_bn): for inference, y = BN(conv(x)) is replaced by an
equivalent conv. Works directly on the flax variables tree without
touching model code: within each module, `Conv_i`/`ConvNorm`-style
kernels paired 1:1 with `BatchNorm_i` stats are rescaled

    kernel' = kernel * scale / sqrt(var + eps)

and the BatchNorm is turned into a pure bias add (mean=0, var=1-eps,
scale=1, bias' = bias - mean * scale / sqrt(var + eps)), which is
numerically identical in eval mode and removes the per-channel
normalization work.
"""

import numpy as np

__all__ = ['fuse_conv_bn']

_EPS = 1e-5


def _fuse_pair(kernel, bn_params, bn_stats):
    scale = np.asarray(bn_params['scale'], np.float64)
    bias = np.asarray(bn_params['bias'], np.float64)
    mean = np.asarray(bn_stats['mean'], np.float64)
    var = np.asarray(bn_stats['var'], np.float64)
    factor = scale / np.sqrt(var + _EPS)
    k = np.asarray(kernel, np.float64) * factor   # broadcast on out axis
    new_bias = bias - mean * factor
    dt = np.asarray(kernel).dtype
    return (k.astype(dt),
            dict(scale=np.ones_like(scale, np.float32),
                 bias=new_bias.astype(np.float32)),
            dict(mean=np.zeros_like(mean, np.float32),
                 var=np.full_like(var, 1.0 - _EPS, np.float32)))


def fuse_conv_bn(variables):
    """Return a new variables dict with conv+BN pairs fused.

    Pairs `Conv_<i>` (or `ConvTranspose_<i>`) with `BatchNorm_<i>`
    inside the same module dict — the 1:1 index correspondence all
    dfm_tpu blocks maintain. Safe on modules without BN (no-op).
    """
    import jax
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables.get('batch_stats', {}))
    fused = 0

    def walk(p_node, s_node):
        nonlocal fused
        if not isinstance(p_node, dict):
            return
        for name in list(p_node.keys()):
            child = p_node[name]
            if isinstance(child, dict) and 'kernel' in child:
                for prefix in ('Conv_', 'ConvTranspose_'):
                    if name.startswith(prefix):
                        idx = name[len(prefix):]
                        bn = f'BatchNorm_{idx}'
                        if bn in p_node and isinstance(s_node, dict) and \
                                bn in s_node:
                            k, bp, bs = _fuse_pair(
                                child['kernel'], p_node[bn], s_node[bn])
                            child['kernel'] = k
                            p_node[bn] = bp
                            s_node[bn] = bs
                            fused += 1
            if isinstance(child, dict):
                walk(child, s_node.get(name, {})
                     if isinstance(s_node, dict) else {})

    walk(params, stats)
    out = dict(variables)
    out['params'] = params
    out['batch_stats'] = stats
    out['_num_fused'] = fused
    num = out.pop('_num_fused')
    return out, num
