"""torch -> flax parameter conversion utilities.

Groundwork for the reference-checkpoint importer (reference
tools/model_converters/convert_dfm_checkpoints.py role): layer-level
mappings between torch state_dict tensors and flax param/batch_stats
entries, validated numerically in tests (torch CPU is available in the
dev image; full-model name mapping lands with the checkpoint importer).

Conventions:
  * torch Conv2d weight (O, I, kH, kW)   -> flax (kH, kW, I, O)
  * torch Conv3d weight (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)
  * torch BatchNorm {weight, bias} -> flax params {scale, bias};
    {running_mean, running_var} -> batch_stats {mean, var}
  * torch Linear weight (O, I) -> flax (I, O)
"""

import numpy as np

__all__ = ['convert_conv2d', 'convert_conv3d', 'convert_bn',
           'convert_linear', 'convert_groupnorm']


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach')
                      else t)


def convert_conv2d(weight, bias=None):
    out = {'kernel': _np(weight).transpose(2, 3, 1, 0)}
    if bias is not None:
        out['bias'] = _np(bias)
    return out


def convert_conv3d(weight, bias=None):
    out = {'kernel': _np(weight).transpose(2, 3, 4, 1, 0)}
    if bias is not None:
        out['bias'] = _np(bias)
    return out


def convert_linear(weight, bias=None):
    out = {'kernel': _np(weight).T}
    if bias is not None:
        out['bias'] = _np(bias)
    return out


def convert_bn(weight, bias, running_mean, running_var):
    return ({'scale': _np(weight), 'bias': _np(bias)},
            {'mean': _np(running_mean), 'var': _np(running_var)})


def convert_groupnorm(weight, bias):
    return {'scale': _np(weight), 'bias': _np(bias)}
