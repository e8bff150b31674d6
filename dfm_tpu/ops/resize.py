"""Linear resize with PyTorch `align_corners=True` semantics, as
separable interpolation matmuls.

The reference leans on `F.interpolate(..., align_corners=True)` (SPP neck
bilinear upsample, DepthHead trilinear x4, upconv x2). On TPU the natural
formulation is a per-axis interpolation matrix contraction: each axis
resize is `out = W_axis @ x` with a (out_size, in_size) matrix that has two
nonzeros per row — XLA turns these into MXU matmuls and fuses the chain,
instead of scatter/gather resize kernels.
"""

import functools

import jax

import jax.numpy as jnp
import numpy as np

__all__ = ['interp_matrix', 'resize_linear', 'avg_pool_2d']


@functools.lru_cache(maxsize=128)
def _interp_matrix_np(in_size, out_size, align_corners=True):
    w = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    if align_corners:
        src = np.arange(out_size) * (in_size - 1) / max(out_size - 1, 1)
    else:
        scale = in_size / out_size
        src = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0)
        src = np.minimum(src, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w[np.arange(out_size), lo] += 1 - frac
    w[np.arange(out_size), hi] += frac
    return w


def interp_matrix(in_size, out_size, align_corners=True, dtype=jnp.float32):
    """(out_size, in_size) linear interpolation matrix."""
    return jnp.asarray(
        _interp_matrix_np(in_size, out_size, align_corners), dtype=dtype)


def resize_linear(x, out_sizes, axes, align_corners=True):
    """Resize `x` linearly along `axes` to `out_sizes`.

    Args:
        x: array, channels-last style layout recommended.
        out_sizes: target sizes (one per axis).
        axes: axes to resize.

    Bilinear == two axes, trilinear == three. Matches torch
    `F.interpolate(mode='bilinear'/'trilinear', align_corners=True)`.
    """
    for axis, out_size in zip(axes, out_sizes):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        w = interp_matrix(in_size, out_size, align_corners, x.dtype)
        # Precision: the default bf16 matmul pass visibly quantizes
        # interpolation weights IF they are not bf16-representable. For
        # the model's hot resizes (2x/4x integer upsampling: fracs are
        # 0.25/0.5/0.75) the weights ARE exact bf16, and with a bf16
        # input the MXU multiplies exactly and accumulates in f32 — so
        # DEFAULT is bit-identical to HIGHEST at 1/6 the passes
        # (measured: the neck upconv's HIGHEST resizes were a ~1 ms/
        # frame sink). Keep HIGHEST whenever it could change the result.
        wnp = _interp_matrix_np(in_size, out_size, align_corners)
        import ml_dtypes
        w_exact = bool(
            np.all(wnp.astype(ml_dtypes.bfloat16).astype(np.float32)
                   == wnp))
        prec = (jax.lax.Precision.DEFAULT
                if w_exact and x.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        x = jnp.tensordot(w, jnp.moveaxis(x, axis, 0), axes=((1,), (0,)),
                          precision=prec)
        x = jnp.moveaxis(x, 0, axis)
    return x


def avg_pool_2d(x, window, stride=None):
    """Average pooling over H, W of a NHWC tensor (VALID padding)."""
    import jax
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window[0], window[1], 1), (1, stride[0], stride[1], 1), 'VALID')
    return out / (window[0] * window[1])
