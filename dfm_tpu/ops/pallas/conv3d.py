"""Pallas TPU kernel: 3x3x3 Conv3D via dx-packed lanes + in-VMEM im2col.

Why: XLA's Conv3D at the DfM cost-volume width (32 channels) runs at
~7 TFLOP/s on v5e (the 32-wide contraction starves the MXU);
decomposing to 2D convs reaches ~12 TFLOP/s. This kernel contracts at
the MXU's native 128 width with zero gather/roll work and DMAs every
input slice exactly once per row band.

Layout trick: the input is packed in XLA as (D+2, H+2, W_pad, 128)
where the lane axis carries the three W-shifted copies of the 32
channels (lanes [dx*32:(dx+1)*32] = x shifted left by dx; remaining
lanes zero). The TPU memory layout pads 32 channels to 128 lanes
anyway, so the packing occupies otherwise-wasted space — and it removes
every Mosaic alignment hazard (tile-aligned DMA slices, no 16-bit
rotates, no sub-lane slicing). A 3x3x3xC contraction then becomes NINE
(TH*W, 128) x (128, C_out) matmuls per output slab (dx rides in lanes).

Pipeline: grid = (H/TH, D/DB); each program loops over a DB-deep chunk
of D with a 4-slot ring of z-slices, starting the DMA for slice d+3
while computing output d from ring slices (d, d+1, d+2) — each padded
z-slice is read from HBM ~once per row band (chunk-boundary slices
twice).

Torch 'same' symmetric padding, stride 1 (matches layers.Conv3DSum);
stride-2 convs stay on the XLA path.

STATUS (v1): compiles and runs correctly on the v5e (bf16 tolerance);
measured 14 ms vs XLA's 6.5 ms at DfM shapes — the strided window DMA
dominates. Not yet on the default path; kept as working Pallas
infrastructure with the Mosaic constraints mapped out (tile-aligned DMA,
no 16-bit rotates, 128-aligned lane slices, one wait per DMA start —
double-waiting a semaphore crashes the core). v2 plan in NOTES.md.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['conv3d_pallas']

LANE = 128
RING = 4
DB = 8


def _kernel(xp_ref, w_ref, out_ref, ring, sems, *, th, w_out):
    h = pl.program_id(0)
    dblk = pl.program_id(1)
    d0 = dblk * DB

    def slice_dma(slot, z):
        return pltpu.make_async_copy(
            xp_ref.at[z, pl.ds(h * th, th + 2), :, :],
            ring.at[slot], sems.at[slot])

    # prefetch the first three z-slices of this chunk
    for j in range(3):
        slice_dma(j % RING, d0 + j).start()

    # unrolled D loop: j is a python int, so ring slots are static and
    # each slice's DMA is waited exactly once (a semaphore is signaled
    # once per start; double-waiting deadlocks/crashes the core)
    for j in range(DB):
        if j + 3 < DB + 2:
            # start fetching slice j+3 (consumed at output j+1)
            slice_dma((j + 3) % RING, d0 + j + 3).start()
        new = range(3) if j == 0 else [2]
        for dz in new:
            slice_dma((j + dz) % RING, d0 + j + dz).wait()

        acc = jnp.zeros((th * w_out, w_ref.shape[1]), jnp.float32)
        for dz in range(3):
            slot = (j + dz) % RING
            for dy in range(3):
                view = ring[slot, dy:dy + th, :w_out, :]
                tap = dz * 3 + dy
                acc = acc + jnp.dot(
                    view.reshape(th * w_out, LANE),
                    w_ref[tap * LANE:(tap + 1) * LANE, :],
                    preferred_element_type=jnp.float32)
        out_ref[j, :, :, :] = acc.reshape(
            th, w_out, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('th', 'interpret'))
def conv3d_pallas(x, weights, th=16, interpret=False):
    """3x3x3 stride-1 Conv3D, torch 'same' symmetric padding.

    Args:
        x: (D, H, W, C) volume (bf16/f32), 3*C <= 128.
        weights: (3, 3, 3, C, C_out).
        th: output rows per program (H % th must be 0).

    Returns:
        (D, H, W, C_out).
    """
    d, h, w, c = x.shape
    c_out = weights.shape[-1]
    assert h % th == 0, (h, th)
    assert d % DB == 0, (d, DB)
    assert 3 * c <= LANE, c
    w_pad = ((w + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, w_pad - w - 1), (0, 0)))
    shifts = [xp] + [
        jnp.pad(xp, ((0, 0), (0, 0), (0, dx), (0, 0)))[:, :, dx:, :]
        for dx in (1, 2)
    ]
    xp_packed = jnp.concatenate(shifts, axis=-1)
    xp_packed = jnp.pad(xp_packed,
                        ((0, 0), (0, 0), (0, 0), (0, LANE - 3 * c)))
    wmat = weights.astype(x.dtype).reshape(3, 3, 3 * c, c_out)
    wmat = jnp.pad(wmat, ((0, 0), (0, 0), (0, LANE - 3 * c), (0, 0)))
    wmat = wmat.reshape(9 * LANE, c_out)

    kernel = functools.partial(_kernel, th=th, w_out=w)
    out = pl.pallas_call(
        kernel,
        grid=(h // th, d // DB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # packed x
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights
        ],
        out_specs=pl.BlockSpec(
            (DB, th, w, c_out), lambda hi, di: (di, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((RING, th + 2, w_pad, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        interpret=interpret,
    )(xp_packed, wmat)
    return out
