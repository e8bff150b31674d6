"""Pallas TPU kernel: fused 3x3x3 Conv3D (+GroupNorm partial stats).

The DfM stereo trunk is dominated by narrow (C=32) 3^3 convolutions:
XLA's best lowering (3 z-shifted 2D convs, tools/convbench.py `zsum`)
reaches ~23 TFLOP/s on v5e because a 32-wide output starves the MXU's
128 lanes, and GroupNorm adds an extra ~0.8-1.7 ms of HBM round-trips
per layer.

This kernel fills all 128 output lanes by producing FOUR depth slices
per matmul: input z-slices are packed along lanes (each slice DMA'd
into its own 32-lane window of the scratch buffer), so every (dy, dx)
tap of the 3x3x3 stencil becomes ONE (TH*W, 6C) @ (6C, 4*C_out) matmul

    lhs = x[z0-1 : z0+5, h0+dy-1 : h0+dy-1+TH, dx : dx+W]  (z in lanes)
    rhs = W_big[dy*3+dx],
    W_big[t, zi*C+ci, j*C_out+co] = K[zi-j, dy, dx, ci, co] (0<=zi-j<3)

i.e. a banded-zero weight computes output slices z0..z0+3 from their
6-slice input halo in one pass: 2x redundant FLOPs (each input slice
feeds 4 outputs but only 3 taps are nonzero) at full MXU lane
occupancy.

GroupNorm fusion: the kernel also emits per-program partial moments
(sum, sum^2) over its f32 accumulator, so the caller finishes GN with
one tiny reduction instead of re-reading the volume (`conv3d_gn` folds
the normalization into a single scale/bias apply, matching
models/layers.py `fold_gn_apply`).

Constraints: stride 1, torch 'same' symmetric padding, D % 4 == 0,
H % TH == 0, C_out * 4 == 128 -> C_out == 32 (the DfM trunk width).
Equivalent of the reference's convbn_3d stacks
(mmdet3d/models/backbones/dfm_backbone.py:118-214).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['conv3d_zpack', 'conv3d_gn', 'pack_weights']

ZB = 4           # output z-slices per program (ZB * C_out == 128)


def pack_weights(weights):
    """(3, 3, 3, C, C_out) -> (9, (ZB+2)*C, ZB*C_out) banded-dense.

    Works on traced (jnp) weights: pure concatenation of static blocks.
    """
    kz, ky, kx, c, c_out = weights.shape
    assert (kz, ky, kx) == (3, 3, 3)
    w = jnp.asarray(weights, jnp.float32)
    rows = []
    for dy in range(3):
        for dx in range(3):
            cols = []
            for j in range(ZB):
                blocks = []
                if j:
                    blocks.append(jnp.zeros((j * c, c_out), jnp.float32))
                blocks.extend([w[0, dy, dx], w[1, dy, dx], w[2, dy, dx]])
                if ZB - 1 - j:
                    blocks.append(
                        jnp.zeros(((ZB - 1 - j) * c, c_out), jnp.float32))
                cols.append(jnp.concatenate(blocks, axis=0))
            rows.append(jnp.concatenate(cols, axis=1))
    return jnp.stack(rows)                    # (9, (ZB+2)*C, ZB*C_out)


def _kernel(xp_ref, w_ref, out_ref, ps_ref, packed, sems, *,
            th, w_out, c, zb, c_out, lanes):
    nh = pl.num_programs(1)
    k = pl.program_id(0)          # z-block
    hi = pl.program_id(1)         # h-tile
    p = k * nh + hi
    slot = jax.lax.rem(p, 2)

    def issue(prog, sl):
        kk = prog // nh
        hh = jax.lax.rem(prog, nh)
        return pltpu.make_async_copy(
            xp_ref.at[kk, pl.ds(hh * th, th + 2), :, :],
            packed.at[sl, 0:th + 2], sems.at[sl])

    @pl.when(p == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(p + 1 < pl.num_programs(0) * nh)
    def _next():
        issue(p + 1, jax.lax.rem(p + 1, 2)).start()

    issue(p, slot).wait()

    # flat row-shift formulation: the (th+2, wp, L) buffer is viewed
    # as ((th+2)*wp, L) (wp is a multiple of the sublane tile, so the
    # merge is a free relayout); tap (dy, dx) is then a row shift by
    # dy*wp + dx — 9 matmuls over row-offset views, no per-tap copies.
    wp = packed.shape[2]
    flat = packed[slot].reshape((th + 3) * wp, lanes)
    nrows = th * wp
    acc = jnp.zeros((nrows, zb * c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sft = dy * wp + dx
            acc = acc + jax.lax.dot(
                flat[sft:sft + nrows], w_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32)

    accw = acc.reshape(th, wp, zb * c_out)[:, :w_out, :]
    af = accw.reshape(th * w_out, zb * c_out)
    ps_ref[0, 0, 0, :] = jnp.sum(af, axis=0)
    ps_ref[0, 0, 1, :] = jnp.sum(af * af, axis=0)
    for j in range(zb):
        out_ref[j] = accw[:, :, j * c_out:(j + 1) * c_out].astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('th', 'interpret'))
def conv3d_zpack(x, w_big, th=8, interpret=False):
    """3x3x3 stride-1 'same' Conv3D via z-packed full-lane matmuls.

    Args:
        x: (D, H, W, C) volume, D % ZB == 0, H % th == 0.
        w_big: (9, (ZB+2)*C, ZB*C_out) packed weights (`pack_weights`).

    Returns:
        (out (D, H, W, C_out), partials (D//ZB, H//th, 2, ZB*C_out) f32)
        — partials[..., 0, :] / [..., 1, :] are per-tile sum / sum^2 of
        the f32 accumulator (lane j*C_out+co = z-slice ZB*k+j, chan co).
    """
    d, h, w, c = x.shape
    zb = ZB
    c_out = w_big.shape[-1] // zb
    assert d % zb == 0 and h % th == 0, (d, h, th)
    assert w_big.shape == (9, (zb + 2) * c, zb * c_out), w_big.shape
    # W dim of the scratch must be a multiple of the bf16 sublane tile
    # (16) so the kernel's (th+2, wp, L) -> ((th+2)*wp, L) flattening is
    # a free view
    wp8 = ((w + 2 + 15) // 16) * 16
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp8 - w - 1), (0, 0)))
    # z-pack in XLA: block k carries slices 4k-1 .. 4k+4 along lanes
    # (sub-128-lane HBM slices are not DMA-able from the kernel; this
    # one fused XLA pass costs a ~1.5x re-materialization of x and
    # makes every kernel DMA a single fully-aligned block copy)
    xp6 = jnp.concatenate(
        [xp[zi:zi + (d // zb - 1) * zb + 1:zb] for zi in range(zb + 2)],
        axis=-1)                                # (D/4, H+2, Wp8, 6C)
    # manual-DMA lane dim must be a multiple of 128: zero-pad (the
    # matching weight rows are zero, so the matmul result is unchanged)
    lanes = (zb + 2) * c
    lp = ((lanes + 127) // 128) * 128
    if lp != lanes:
        xp6 = jnp.pad(xp6, ((0, 0),) * 3 + ((0, lp - lanes),))

    w_pad = jnp.pad(w_big, ((0, 0), (0, lp - lanes), (0, 0)))
    kernel = functools.partial(
        _kernel, th=th, w_out=w, c=c, zb=zb, c_out=c_out, lanes=lp)
    out, ps = pl.pallas_call(
        kernel,
        grid=(d // zb, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # z-packed x
            pl.BlockSpec(memory_space=pltpu.VMEM),     # packed weights
        ],
        out_specs=[
            pl.BlockSpec((zb, th, w, c_out),
                         lambda k, hi: (k, hi, 0, 0)),
            pl.BlockSpec((1, 1, 2, zb * c_out),
                         lambda k, hi: (k, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h, w, c_out), x.dtype),
            jax.ShapeDtypeStruct((d // zb, h // th, 2, zb * c_out),
                                 jnp.float32),
        ],
        scratch_shapes=[
            # one spare (never-read-into-results) row: the largest tap
            # shift reads 2 rows past the (th+2) DMA'd rows for output
            # rows that land in the discarded wp-padding columns
            pltpu.VMEM((2, th + 3, wp8, lp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp6, w_pad.astype(x.dtype))
    return out, ps


def conv3d_gn(x, weights, scale, bias, num_groups, eps=1e-5,
              residual=None, relu=False, th=8, interpret=False):
    """Fused ConvNorm: 3^3 conv + GroupNorm (+residual, +relu).

    Same GN semantics as models/layers.py GroupNorm (f32 stats,
    var = E[x^2] - E[x]^2, folded scale/bias apply). `weights` is the
    nn.Conv layout (3, 3, 3, C, C_out). Single sample (no batch dim);
    the DfM hot path vmaps/loops outside.
    """
    d, h, w, c = x.shape
    c_out = weights.shape[-1]
    w_big = pack_weights(weights)
    out, ps = conv3d_zpack(x, w_big, th=th, interpret=interpret)
    g = num_groups
    s = ps[..., 0, :].sum(axis=(0, 1)).reshape(ZB, c_out).sum(axis=0)
    s2 = ps[..., 1, :].sum(axis=(0, 1)).reshape(ZB, c_out).sum(axis=0)
    cnt = d * h * w * (c_out // g)
    mean = s.reshape(g, c_out // g).sum(axis=1) / cnt
    var = s2.reshape(g, c_out // g).sum(axis=1) / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)                     # (g,)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, c_out // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, c_out // g)
    sc = (scale * rstd[:, None]).reshape(c_out)
    bs = (bias - mean[:, None] * scale * rstd[:, None]).reshape(c_out)
    y = out.astype(jnp.float32) * sc + bs
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
