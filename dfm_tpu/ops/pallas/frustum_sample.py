"""Pallas TPU kernel: separable frustum stereo sampling.

Replaces the XLA einsum formulation of
`frustum_separable.separable_stereo_sample` (~8.6 ms at DfM shapes:
XLA runs the grouped hat-matrix contractions at <10 TFLOP/s and
materializes a 300 MB intermediate). Same math — per x-slab group,
two volume depth-slices are lerped and interpolated in v then u by
2-tap hat matrices — restructured for the MXU:

  per slab GROUP g (slabs sharing a depth-slice pair, ~71 groups):
    1. DMA the two slices of vol (pre-transposed to (D, H, C, Wp) with
       W lane-padded to 384) into VMEM: (2, H, C, Wp);
    2. stage 1 (v-interp + depth lerp): per channel-block c, one
       (R*nzp, 2H) @ (2H, Wp) matmul with the group's combined v-hat /
       depth-weight matrix (z padded to nzp for 8-aligned row slices);
    3. stage 2 (u-interp): per slab r, stack the 32 channels' row
       blocks to a FULL-HEIGHT (32*nzp, Wp) operand and hit it with
       the slab's u-hat matrix (Wp, ny) — one full-utilization matmul
       per slab.

Output is (K, R, C*nzp, ny); the JAX wrapper unpads/reorders it and
applies the validity mask. Numerics match the einsum path at bf16
tolerance (both use bf16 hat weights with f32 accumulation).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['frustum_stereo_sample_pallas', 'WPAD']

WPAD = 128      # lane padding granularity for W


def _kernel(z0_ref, mv_ref, mu_ref, vol_ref, out_ref, band, t_buf,
            sems, *, r, nzp, h, c, wp, ny, k_per_b):
    g = pl.program_id(0)
    ri = pl.program_id(1)

    # band DMA + stage 1 once per group (scratch persists over the r
    # sub-grid; single-buffered — VMEM budget)
    @pl.when(ri == 0)
    def _stage1():
        dma = pltpu.make_async_copy(
            vol_ref.at[g // k_per_b, pl.ds(z0_ref[g], 2)], band, sems)
        dma.start()
        dma.wait()
        bd = band[...].reshape(2 * h, c, wp)   # (2H, C, Wp)
        mv = mv_ref[0]                         # (R*nzp, 2H) bf16
        for ci in range(c):
            t_buf[ci] = jax.lax.dot(
                mv, bd[:, ci, :],
                preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

    # stage 2: stack this slab's channel rows -> (C*nzp, Wp) @ (Wp, ny)
    rows = [t_buf[ci, pl.ds(ri * nzp, nzp), :] for ci in range(c)]
    a = jnp.concatenate(rows, axis=0)
    o = jax.lax.dot(a, mu_ref[0, 0],
                    preferred_element_type=jnp.float32)
    out_ref[0, 0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('r', 'nzp', 'grid_shapes'))
def _call(z0, mv, mu, vol_t, r, nzp, grid_shapes):
    """z0 (K,), mv (K, R*nzp, 2H), mu (K, R, Wp, ny), vol_t
    (B, D+1, H, C, Wp) with K = B * groups-per-sample."""
    k, d, h, c, wp, ny = grid_shapes
    k_per_b = k // vol_t.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k, r),
        in_specs=[
            pl.BlockSpec((1, r * nzp, 2 * h),
                         lambda g, ri, s: (g, 0, 0)),
            pl.BlockSpec((1, 1, wp, ny), lambda g, ri, s: (g, ri, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, c * nzp, ny),
                               lambda g, ri, s: (g, ri, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, h, c, wp), jnp.bfloat16),
            pltpu.VMEM((c, r * nzp, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, r=r, nzp=nzp, h=h, c=c, wp=wp,
                          ny=ny, k_per_b=k_per_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, r, c * nzp, ny),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(z0, mv, mu, vol_t)


def frustum_stereo_sample_pallas(vol, u, v, ds, pad_shape, groups):
    """Drop-in replacement for the einsum path (bf16 volumes, TPU).

    Args:
        vol: (D, H, W, C) or batched (B, D, H, W, C) bf16 volume.
        u: ([B,] nx, ny), v: ([B,] nx, nz) pixel coords.
        ds: static dict from `slab_depth_static`.
        pad_shape: (pad_h, pad_w).
        groups: (slice_idx, ord_, mask, runs) from `_group_slabs` +
            `_runs` (static numpy; shared across the batch — the
            depth grouping depends only on the static voxel grid).

    Returns:
        out ([B,] nz, ny, nx, C) bf16, valid2d ([B,] nz, ny, nx).
    """
    if vol.ndim == 5:
        b = vol.shape[0]
        outs = _batched(vol, u, v, ds, pad_shape, groups)
        return outs
    out, valid = _batched(vol[None], u[None], v[None], ds, pad_shape,
                          groups)
    return out[0], valid[0]


def _batched(vol, u, v, ds, pad_shape, groups):
    from ..frustum_separable import hat_matrix
    b, d, h, w, c = vol.shape
    nx, ny = u.shape[1:]
    nz = v.shape[2]
    pad_h, pad_w = pad_shape
    slice_idx, ord_, mask, runs = groups
    k, r = ord_.shape
    nzp = -(-nz // 8) * 8
    wp = -(-w // WPAD) * WPAD

    ordj = jnp.asarray(ord_)
    x_idx = u / (pad_w - 1) * (w - 1)
    y_idx = v / (pad_h - 1) * (h - 1)

    # u-hat per grouped slab, transposed + lane-padded: (K, R, Wp, ny)
    mu = hat_matrix(x_idx[:, ordj], w, jnp.bfloat16)  # (B, K, R, ny, w)
    mu = jnp.swapaxes(mu, -1, -2)                     # (B, K, R, w, ny)
    mu = jnp.pad(mu, ((0, 0),) * 3 + ((0, wp - w), (0, 0)))
    mu = mu.reshape(b * k, r, wp, ny)

    # v-hat with depth-lerp folded, z-padded: (B*K, R*nzp, 2H)
    mv = hat_matrix(y_idx[:, ordj], h, jnp.float32)   # (B, K, R, nz, h)
    w0 = jnp.asarray(ds['w0'])[ord_] * mask
    w1 = jnp.asarray(ds['w1'])[ord_] * mask
    mv01 = jnp.concatenate([mv * w0[..., None, None],
                            mv * w1[..., None, None]], axis=-1)
    mv01 = jnp.pad(mv01, ((0, 0),) * 3 + ((0, nzp - nz), (0, 0))
                   ).reshape(b * k, r * nzp, 2 * h).astype(jnp.bfloat16)

    # volume: (B, D+1, H, C, Wp); slice D replicates D-1 so the
    # z1 = z0+1 fetch matches the einsum path's clamp. The barrier
    # stops the custom-call's layout constraint from propagating into
    # the producer convs (measured: without it the whole upstream
    # trunk re-layouts and the model regresses ~30 ms)
    vol = jax.lax.optimization_barrier(vol)
    vol_t = jnp.pad(vol.transpose(0, 1, 2, 4, 3),
                    ((0, 0),) * 4 + ((0, wp - w),))
    vol_t = jnp.concatenate([vol_t, vol_t[:, -1:]], axis=1)
    z0 = jnp.tile(np.minimum(slice_idx, d - 1).astype(np.int32), b)

    out = _call(jnp.asarray(z0), mv01, mu,
                vol_t.astype(jnp.bfloat16), r, nzp,
                (b * k, d + 1, h, c, wp, ny))      # (B*K, R, C*nzp, ny)

    # unpad: rows (c, nzp) -> (nz, c); concat run lengths -> nx order
    out = jax.lax.optimization_barrier(out)
    out = out.reshape(b, k, r, c, nzp, ny)[:, :, :, :, :nz, :]
    out = jnp.concatenate([out[:, ki, :n] for ki, (_, _, n) in
                           enumerate(runs)], axis=1)  # (B,nx,c,nz,ny)
    out = out.transpose(0, 3, 4, 1, 2)                # (B,nz,ny,nx,c)

    valid2d = ((u >= 0) & (u <= pad_w))[:, None].swapaxes(-1, -2) & \
              jnp.swapaxes((v >= 0) & (v <= pad_h), -1, -2)[:, :, None]
    valid = valid2d & jnp.asarray(ds['in_range'])[None, None, None, :]
    return (out * valid[..., None]).astype(vol.dtype), valid2d


def _att_kernel(z0_ref, mv_ref, mu_ref, smf_ref, out_ref, band, sems,
                *, nzp, hf, wf, ny, per_b):
    s = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(s, 2)

    def issue(prog, sl):
        return pltpu.make_async_copy(
            smf_ref.at[prog // per_b, pl.ds(z0_ref[prog], 2)],
            band.at[sl], sems.at[sl])

    @pl.when(s == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(s + 1 < n)
    def _next():
        issue(s + 1, jax.lax.rem(s + 1, 2)).start()

    pltpu.make_async_copy(
        smf_ref.at[s // per_b, pl.ds(z0_ref[s], 2)], band.at[slot],
        sems.at[slot]).wait()
    bd = band[slot].reshape(2 * hf, wf)
    t = jax.lax.dot(mv_ref[0], bd,
                    preferred_element_type=jnp.float32)   # (nzp, Wf)
    o = jax.lax.dot(t.astype(jnp.bfloat16), mu_ref[0],
                    preferred_element_type=jnp.float32)   # (nzp, ny)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('nzp', 'shapes'))
def _att_call(z0, mv, mu, smf, nzp, shapes):
    n, hf, wf, ny = shapes
    per_b = n // smf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, nzp, 2 * hf), lambda s, p: (s, 0, 0)),
            pl.BlockSpec((1, wf, ny), lambda s, p: (s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, nzp, ny), lambda s, p: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 2, hf, wf), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_att_kernel, nzp=nzp, hf=hf, wf=wf, ny=ny,
                          per_b=per_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nzp, ny), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(z0, mv, mu, smf)


def attention_sample_pallas(sm_fine, u, v, dsf, pad_shape):
    """Pallas version of `separable_softmax_attention` (bf16, TPU).

    Per x-slab: 2-slice band DMA of the fine softmax volume, depth
    lerp folded into the v-hat matrix, two matmuls. Callers must wrap
    the call in lax.cond (top-level Mosaic custom calls wreck the XLA
    schedule — NOTES.md).

    Args:
        sm_fine: ([B,] D_f, H_f, W_f) bf16 fine softmax volume.
        u: ([B,] nx, ny), v: ([B,] nx, nz) pixel coords.
        dsf: static dict from slab_depth_static(num_bins=D_f).

    Returns: ([B,] nz, ny, nx) f32 attention, zero outside validity.
    """
    from ..frustum_separable import hat_matrix
    if sm_fine.ndim == 2:
        raise ValueError
    batched = sm_fine.ndim == 4
    if not batched:
        sm_fine, u, v = sm_fine[None], u[None], v[None]
    b, df, hf, wf = sm_fine.shape
    nx, ny = u.shape[1:]
    nz = v.shape[2]
    pad_h, pad_w = pad_shape
    nzp = -(-nz // 8) * 8

    x_f = u / (pad_w - 1) * (wf - 1)
    y_f = v / (pad_h - 1) * (hf - 1)
    mu = hat_matrix(x_f, wf, jnp.bfloat16)             # (B, nx, ny, wf)
    mu = jnp.swapaxes(mu, -1, -2).reshape(b * nx, wf, ny)
    mv = hat_matrix(y_f, hf, jnp.float32)              # (B, nx, nz, hf)
    w0 = jnp.asarray(dsf['w0'])[None, :, None, None]
    w1 = jnp.asarray(dsf['w1'])[None, :, None, None]
    mv01 = jnp.concatenate([mv * w0, mv * w1], axis=-1)
    mv01 = jnp.pad(mv01, ((0, 0), (0, 0), (0, nzp - nz), (0, 0))
                   ).reshape(b * nx, nzp, 2 * hf).astype(jnp.bfloat16)

    smf = jnp.concatenate([sm_fine, sm_fine[:, -1:]], axis=1)
    z0 = jnp.tile(np.minimum(np.asarray(dsf['z0']), df - 1
                             ).astype(np.int32), b)

    out = _att_call(jnp.asarray(z0), mv01, mu,
                    smf.astype(jnp.bfloat16), nzp,
                    (b * nx, hf, wf, ny))              # (B*nx, nzp, ny)
    out = out.reshape(b, nx, nzp, ny)[:, :, :nz, :].astype(jnp.float32)
    att = out.transpose(0, 2, 3, 1)                    # (B, nz, ny, nx)

    valid2d = ((u >= 0) & (u <= pad_w))[:, None].swapaxes(-1, -2) & \
              jnp.swapaxes((v >= 0) & (v <= pad_h), -1, -2)[:, :, None]
    valid = valid2d & jnp.asarray(dsf['in_range'])[None, None, None, :]
    att = att * valid
    return (att, valid2d) if batched else (att[0], valid2d[0])
