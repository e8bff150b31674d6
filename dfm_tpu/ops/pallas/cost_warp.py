"""Pallas TPU kernel: plane-sweep prev-frame warp as band matmuls.

The cost volume's prev-frame sample (reference dfm_backbone.py:296-311,
`F.grid_sample` over a (D, H', W') grid) is the framework's largest
remaining gather: 1.8M bilinear taps from a ~26 MB feature map, which
XLA lowers to row-count-bound gathers (~17 ns/row -> ~31 ms at DfM
shapes).

Structure this kernel exploits: for one (depth-plane d, output row h)
pair, the sample's source v-coordinates vary only through the small
rotation/parallax terms — every tap of the 320-output row lives in a
narrow BAND of K=4 consecutive feature rows (the u-coordinate sweeps
the full width, the v-coordinate barely moves). So per (d, h):

    1. DMA the K-row band prev[v0:v0+K] into VMEM
       (prev pre-transposed to (H, C, W): the band stacks to a
       (K*C=128, W) matrix — a full-height MXU operand, no padding);
    2. build the 2-tap hat matrix  hat[win, u] = relu(1 - |win - u'|)
       with a broadcasted iota (the only VPU-heavy step);
    3. one (128, W) @ (W, Wq) matmul = u-interpolation of all K rows
       for all outputs at once;
    4. weight the K row-chunks with per-output v-hat weights and sum.

Zero-padding border semantics match `grid_sample(padding_mode='zeros',
align_corners=True)` exactly: hat weights vanish for out-of-range taps
(the band is clipped inside the image; true taps outside it contribute
their correct zero).

The band-width precondition (all taps of a row within K-1 rows) is
checked in JAX per sample; `warp_prev_band` returns the kernel result
and the check, and the caller falls back to the packed-gather path via
`lax.cond` when any row violates it (large rotations / exotic augs).

bf16 tables only (hat weights round to bf16 like the separable frustum
samplers); f32 models keep the exact gather path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['warp_prev_band', 'band_ok', 'BAND_K']

BAND_K = 4


def _kernel(vstart_ref, u_ref, v_ref, prev_ref, out_ref, band, sems,
            *, k, h_feat, w_feat, wq, c, per_b):
    p = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(p, 2)

    def issue(prog, sl):
        v0 = vstart_ref[prog]
        b = prog // per_b
        return pltpu.make_async_copy(
            prev_ref.at[b, pl.ds(v0, k)], band.at[sl], sems.at[sl])

    @pl.when(p == 0)
    def _first():
        issue(0, 0).start()

    @pl.when(p + 1 < n)
    def _next():
        issue(p + 1, jax.lax.rem(p + 1, 2)).start()

    # wait for this program's band: (K, C, W) -> (K*C, W)
    pltpu.make_async_copy(prev_ref.at[p // per_b,
                                      pl.ds(vstart_ref[p], k)],
                          band.at[slot], sems.at[slot]).wait()
    a = band[slot].reshape(k * c, w_feat)

    u = u_ref[0, 0, :]                                # (Wq,) f32
    win = jax.lax.broadcasted_iota(jnp.int32, (w_feat, wq), 0
                                   ).astype(jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(win - u[None, :]))
    t = jax.lax.dot(a, hat.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)   # (K*C, Wq)

    v = v_ref[0, 0, :]                                # (Wq,) f32
    v0 = vstart_ref[p].astype(jnp.float32)
    acc = jnp.zeros((c, wq), jnp.float32)
    for r in range(k):
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(v - (v0 + r)))  # (Wq,)
        acc = acc + t[r * c:(r + 1) * c, :] * wv[None, :]
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def band_ok(v, h, k=BAND_K):
    """True iff every (.., d, h') output row's v-taps fit a K-row band
    (kernel precondition). v: (..., D, Hq, Wq) f32."""
    vf = jnp.floor(v).astype(jnp.int32)
    lo = jnp.clip(jnp.min(vf, axis=-1), 0, h - 1)
    hi = jnp.clip(jnp.max(vf, axis=-1) + 1, 0, h - 1)
    return jnp.all(hi - lo <= k - 1)


@functools.partial(jax.jit, static_argnames=('k',))
def warp_prev_band(prev, u, v, k=BAND_K):
    """Warp `prev` by per-output sample coords via the band kernel.

    Args:
        prev: (B, H, W, C) bf16 feature maps.
        u, v: (B, D, Hq, Wq) f32 pixel coords into `prev`
            (align-corners index space, packed_bilinear_sample
            convention).
        k: static band height.

    Returns:
        (B, D, Hq, Wq, C) bf16 samples. Only exact when `band_ok(v, H)`
        — callers must check and fall back (lax.cond) when it fails.
    """
    b, h, w, c = prev.shape
    _, d, hq, wq = u.shape
    assert (k * c) % 8 == 0
    n = b * d * hq

    vf = jnp.floor(v).astype(jnp.int32)
    lo = jnp.clip(jnp.min(vf, axis=-1), 0, h - 1)        # (B, D, Hq)
    v_start = jnp.clip(lo, 0, h - k).reshape(-1)         # (N,)

    prev_t = prev.transpose(0, 3, 1, 2).swapaxes(1, 2)   # (B, H, C, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, wq), lambda p, s: (p, 0, 0)),   # u rows
            pl.BlockSpec((1, 1, wq), lambda p, s: (p, 0, 0)),   # v rows
            pl.BlockSpec(memory_space=pltpu.ANY),               # prev
        ],
        out_specs=pl.BlockSpec((1, c, wq), lambda p, s: (p, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, k, c, w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, h_feat=h, w_feat=w, wq=wq, c=c,
                          per_b=d * hq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, wq), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(v_start, u.reshape(n, 1, wq), v.reshape(n, 1, wq),
      prev_t.astype(jnp.bfloat16))
    return out.reshape(b, d, hq, c, wq).transpose(0, 1, 2, 4, 3)
