"""Pallas TPU kernels: packed-layout 3^3 conv chains for the DfM trunk.

The DfM stereo trunk is dominated by full-resolution C=32 3^3 convs
(reference mmdet3d/models/backbones/dfm_backbone.py:175-186): XLA's
best lowering leaves 3/4 of the MXU lanes idle. `ops/pallas/convgn.py`
fixed the lane occupancy by packing 4 depth slices along lanes, but its
input had to be assembled by a ~6 ms XLA z-interleave per layer, which
parked it (NOTES.md round-3).

This module unparks the idea by making the packed form the *inter-layer
storage format*, so the interleave is never paid between layers:

Packed layout: a (D, H, W, 32) volume is stored as (NB, HP, WP, 128)
bf16 where lane group g in {0..3} of z-block k holds depth slice
z = 4*k + g - phase, rows [TH, TH+H) hold the valid rows (zero padding
stored above/below), cols [0, W) hold the valid cols (zero right
padding to WP = roundup(W+1, 16)), and z-slices outside [0, D) are
stored as zeros. Stored padding means a consumer's tap reads need no
bounds handling; there is NO left column pad — in the flattened
(rows*WP, 128) row-shift formulation a col -1 tap wraps around to the
previous row's right-pad zeros, which is exactly the zero the 'same'
conv wants.

Phase alternation is the trick that makes chains cheap: a 3^3 stride-1
conv consuming phase p writes phase p XOR 2. An output block (4 slices)
then needs 6 input slices that overlap exactly TWO input blocks
(k-1, k when reading phase 0; k, k+1 when reading phase 2), so every
(dy, dx) tap is two full-lane (rows, 128) @ (128, 128) matmuls with
z-banded weights: 2.67x FLOP redundancy at full MXU lane occupancy
(the same arithmetic as convgn.py's measured 2.4 ms/layer), aligned
128-lane output writes, fused GroupNorm partial moments, optional fused
residual-from-input — and NO relayout between layers. The banded weight
matrices are identical for both phase directions (only the block
offsets differ), see `pack_weights_pair`.

Chain ends pay one `pack` / `unpack` relayout each (Pallas kernels
running at DMA rate instead of XLA's ~35 GB/s lane interleave).

Everything here is single-sample (B folded by the caller; the DfM hot
path is b=1) and inference-oriented (the training path keeps the dense
lowering in models/layers.py).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['PackedVol', 'pack_weights_pair', 'conv_p2p', 'pack_vol',
           'unpack_vol', 'gn_from_partials', 'affine_mask', 'pack_vol_ref',
           'unpack_vol_ref']

C = 32          # trunk channel width
G = 4           # z slices per block
L = G * C       # 128 lanes


def _round_up(x, m):
    return (x + m - 1) // m * m


class PackedVol(NamedTuple):
    """A z-packed volume (see module docstring)."""
    data: jnp.ndarray     # (NB, HP, WP, 128)
    phase: int            # 0 or 2: z(k, g) = 4k + g - phase
    d: int
    h: int
    w: int
    th: int               # row tile; valid rows [th, th + h)

    @property
    def nb(self):
        return self.data.shape[0]

    @property
    def wp(self):
        return self.data.shape[2]


def _npad(d, phase):
    """Number of z blocks for depth d at the given phase."""
    assert d % G == 0
    return d // G + (1 if phase == 2 else 0)


def pack_weights_pair(kernel):
    """(3, 3, 3, 32, 32) -> (wa, wb) each (9, 128, 128) z-banded.

    For out lane (g_out*32 + co) and in lane (g_in*32 + ci):
        wa holds tap dz = g_in - g_out - 1   (block offset -1 / 0)
        wb holds tap dz = g_in - g_out + 3   (block offset  0 / +1)
    valid when 0 <= dz < 3. Identical for both phase directions.
    """
    k = jnp.asarray(kernel, jnp.float32)
    assert k.shape[:3] == (3, 3, 3) and k.shape[3] == C and k.shape[4] == C
    wa = jnp.zeros((9, L, L), jnp.float32)
    wb = jnp.zeros((9, L, L), jnp.float32)
    for g_in in range(G):
        for g_out in range(G):
            sl = (slice(g_in * C, (g_in + 1) * C),
                  slice(g_out * C, (g_out + 1) * C))
            dz_a = g_in - g_out - 1
            dz_b = g_in - g_out + 3
            for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                         for dx in range(3)):
                if 0 <= dz_a < 3:
                    wa = wa.at[t, sl[0], sl[1]].set(k[dz_a, dy, dx])
                if 0 <= dz_b < 3:
                    wb = wb.at[t, sl[0], sl[1]].set(k[dz_b, dy, dx])
    return wa, wb


def _conv_kernel(x_ref, wa_ref, wb_ref, out_ref, ps_ref, bufs, sems, *,
                 nh, th, wp, h, w, nbin, nbout, off_a, residual):
    k = pl.program_id(0)
    hi = pl.program_id(1)
    p = k * nh + hi
    n = nbout * nh
    slot = jax.lax.rem(p, 2)
    hp = h + 2 * th

    def issue(prog, sl):
        kk = prog // nh
        hh = jax.lax.rem(prog, nh)
        ka = jnp.clip(kk + off_a, 0, nbin - 1)
        kb = jnp.clip(kk + off_a + 1, 0, nbin - 1)
        s0 = jnp.clip(hh * th - 2, 0, hp - (th + 4))
        ca = pltpu.make_async_copy(x_ref.at[ka, pl.ds(s0, th + 4)],
                                   bufs.at[sl, 0], sems.at[sl, 0])
        cb = pltpu.make_async_copy(x_ref.at[kb, pl.ds(s0, th + 4)],
                                   bufs.at[sl, 1], sems.at[sl, 1])
        return ca, cb

    is_pad = (hi == 0) | (hi == nh - 1)

    def pad_prog(prog):
        hh = jax.lax.rem(prog, nh)
        return (hh == 0) | (hh == nh - 1)

    # pad row-tiles only write zeros — never issue (or wait on) their
    # DMAs. prog 0 is always a pad tile, so _first is a no-op kept only
    # for grids whose first tile could become real.
    @pl.when((p == 0) & jnp.logical_not(pad_prog(0)))
    def _first():
        for c in issue(0, 0):
            c.start()

    @pl.when((p + 1 < n) & jnp.logical_not(pad_prog(p + 1)))
    def _next():
        for c in issue(p + 1, jax.lax.rem(p + 1, 2)):
            c.start()

    @pl.when(jnp.logical_not(is_pad))
    def _wait():
        for c in issue(p, slot):
            c.wait()

        # halo blocks that fall off the input (true zero-pad slices):
        # zero the buffer so the banded matmuls stay uniform
        @pl.when(k + off_a < 0)
        def _za():
            bufs[slot, 0] = jnp.zeros_like(bufs[slot, 0])

        @pl.when(k + off_a + 1 > nbin - 1)
        def _zb():
            bufs[slot, 1] = jnp.zeros_like(bufs[slot, 1])

    @pl.when(jnp.logical_not(is_pad))
    def _compute():
        fa = bufs[slot, 0].reshape((th + 4) * wp, L)
        fb = bufs[slot, 1].reshape((th + 4) * wp, L)
        nrows = th * wp
        acc = jnp.zeros((nrows, L), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sft = (dy + 1) * wp + dx - 1
                t = dy * 3 + dx
                acc = acc + jax.lax.dot(
                    fa[sft:sft + nrows], wa_ref[t],
                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot(
                    fb[sft:sft + nrows], wb_ref[t],
                    preferred_element_type=jnp.float32)
        accw = acc.reshape(th, wp, L)

        # zero stored padding: cols outside [0, w) and, on edge
        # blocks, lane groups whose z falls outside [0, d)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, wp, L), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (th, wp, L), 2)
        valid = col < w
        # out phase q: z = 4k + g - q; q == 2 edge blocks: k == 0 has
        # groups 0, 1 invalid; k == nbout-1 has groups 2, 3 invalid.
        # q == 0: all groups valid. off_a == -1 <=> writing phase 2.
        if off_a == -1:
            valid &= (k != 0) | (lane >= 2 * C)
            valid &= (k != nbout - 1) | (lane < 2 * C)
        accw = jnp.where(valid, accw, 0.0)

        if residual:
            # residual aligned to the out block: groups 0,1 live in
            # buf A lanes [64:128], groups 2,3 in buf B lanes [0:64]
            # (same recombination for both phase directions); rows
            # shift by +2, no col shift.
            ra = bufs[slot, 0][2:2 + th, :, 2 * C:]
            rb = bufs[slot, 1][2:2 + th, :, :2 * C]
            res = jnp.concatenate([ra, rb], axis=-1)
            accw = accw + jnp.where(valid, res.astype(jnp.float32), 0.0)

        af = accw.reshape(th * wp, L)
        ps_ref[0, 0, 0, :] = jnp.sum(af, axis=0)
        ps_ref[0, 0, 1, :] = jnp.sum(af * af, axis=0)
        out_ref[0] = accw.astype(out_ref.dtype)

    @pl.when(is_pad)
    def _pad():
        out_ref[:] = jnp.zeros_like(out_ref)
        ps_ref[:] = jnp.zeros_like(ps_ref)


@functools.partial(jax.jit, static_argnames=(
    'th', 'h', 'w', 'nbout', 'off_a', 'residual', 'interpret'))
def _conv_p2p_call(data, wa, wb, th, h, w, nbout, off_a, residual,
                   interpret=False):
    nbin, hp, wp, _ = data.shape
    nh = hp // th
    kern = functools.partial(
        _conv_kernel, nh=nh, th=th, wp=wp, h=h, w=w, nbin=nbin,
        nbout=nbout, off_a=off_a, residual=residual)
    out, ps = pl.pallas_call(
        kern,
        grid=(nbout, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wp, L), lambda k, hi: (k, hi, 0, 0)),
            pl.BlockSpec((1, 1, 2, L), lambda k, hi: (k, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbout, hp, wp, L), data.dtype),
            jax.ShapeDtypeStruct((nbout, nh, 2, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, th + 4, wp, L), data.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(data, wa.astype(data.dtype), wb.astype(data.dtype))
    return out, ps


def conv_p2p(pv: PackedVol, kernel, residual=False, interpret=False):
    """3^3 stride-1 'same' conv on a packed volume; output phase flips.

    Args:
        pv: PackedVol (bf16 recommended).
        kernel: (3, 3, 3, 32, 32) conv weights (nn.Conv DHWIO layout).
        residual: if True, adds the (out-block-aligned) input to the
            conv result (the dres1 `conv(x) + x` shape — note GN is NOT
            applied in-kernel; see `gn_from_partials`).

    Returns:
        (PackedVol out, partial moments (NB_out, NH, 2, 128) f32). The
        partials are sums / sums-of-squares over the valid region of
        the *pre-residual... includes residual if residual=True* output
        (exactly what was stored), lane l = (z-group l//32, channel
        l%32).
    """
    wa, wb = pack_weights_pair(kernel)
    off_a = -1 if pv.phase == 0 else 0
    nbout = _npad(pv.d, 2 - pv.phase)
    out, ps = _conv_p2p_call(pv.data, wa, wb, pv.th, pv.h, pv.w, nbout,
                             off_a, bool(residual), interpret=interpret)
    return PackedVol(out, 2 - pv.phase, pv.d, pv.h, pv.w, pv.th), ps


def fold_ps_weighted(ps, zw, phase, d, cw=C):
    """Fold per-(block, lane) kernel partial moments to per-channel
    sums with a per-z-slice weight vector (multiplicity-weighted
    GroupNorm; ops/reduced_depth.py).

    ps: (NB, ..., 2, L) — lane l of block k holds z slice
    gpb*k + l//cw - phase where gpb = L//cw lane groups per block.
    zw: (d,) f32 weights. Returns (s, s2, wsum) with s/s2 per-channel
    (cw,) and wsum = sum(zw).
    """
    gpb = L // cw
    assert gpb == 4 or phase == 0   # the gpb=2 (conv_s2) layout is
    nb = ps.shape[0]                # always phase-free
    zwf = np.asarray(zw, np.float32)
    wmat = np.zeros((nb, gpb), np.float32)
    for k in range(nb):
        for gg in range(gpb):
            z = gpb * k + gg - phase
            if 0 <= z < d:
                wmat[k, gg] = zwf[z]
    w = jnp.asarray(np.repeat(wmat, cw, axis=1))          # (NB, L)
    red_axes = tuple(range(1, ps.ndim - 2))
    pss = ps.sum(axis=red_axes) if red_axes else ps       # (NB, 2, L)
    s = (pss[:, 0, :] * w).sum(axis=0).reshape(gpb, cw).sum(axis=0)
    s2 = (pss[:, 1, :] * w).sum(axis=0).reshape(gpb, cw).sum(axis=0)
    return s, s2, float(zwf.sum())


def gn_from_partials(ps, pv: PackedVol, scale, bias, num_groups,
                     eps=1e-5, relu=False, extra=None, zw=None):
    """Finish GroupNorm from kernel partial moments + one fused
    masked affine pass over the packed volume (XLA).

    ps: (NB, NH, 2, 128) from conv_p2p. Matches models/layers.py
    GroupNorm semantics (f32 stats, var = E[x^2] - E[x]^2, folded
    scale/bias). `extra` (same-phase PackedVol data) is added AFTER the
    affine (residual whose values must not be normalized). `zw` (d,)
    gives per-z-slice multiplicity weights (reduced-depth volumes).
    """
    g = num_groups
    if zw is not None:
        s, s2, wsum = fold_ps_weighted(ps, zw, pv.phase, pv.d)
        cnt = wsum * pv.h * pv.w * (C // g)
    else:
        s = ps[..., 0, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
        s2 = ps[..., 1, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
        cnt = pv.d * pv.h * pv.w * (C // g)
    mean = s.reshape(g, C // g).sum(axis=1) / cnt
    var = s2.reshape(g, C // g).sum(axis=1) / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, C // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, C // g)
    sc = jnp.tile((scale * rstd[:, None]).reshape(C), G)
    bs = jnp.tile((bias - mean[:, None] * scale * rstd[:, None]
                   ).reshape(C), G)
    y = affine_mask(pv, sc, bs, relu=relu, extra=extra)
    return PackedVol(y, pv.phase, pv.d, pv.h, pv.w, pv.th)


def affine_mask(pv: PackedVol, sc, bs, relu=False, extra=None):
    """y = mask * f(sc * x + bs) (+ extra), preserving stored zeros in
    the padding. sc/bs are per-lane (128,) f32. One fused XLA pass."""
    x = pv.data.astype(jnp.float32)
    y = x * sc + bs
    if relu:
        y = jnp.maximum(y, 0.0)
    nb, hp, wp, _ = pv.data.shape
    row = jnp.arange(hp)[None, :, None, None]
    col = jnp.arange(wp)[None, None, :, None]
    valid = ((row >= pv.th) & (row < pv.th + pv.h) & (col < pv.w))
    if pv.phase == 2:
        lane = jnp.arange(L)[None, None, None, :]
        blk = jnp.arange(nb)[:, None, None, None]
        valid = valid & ((blk != 0) | (lane >= 2 * C)) \
            & ((blk != nb - 1) | (lane < 2 * C))
    y = jnp.where(valid, y, 0.0)
    if extra is not None:
        y = y + extra.astype(jnp.float32)
    return y.astype(pv.data.dtype)


# ---------------------------------------------------------------------------
# pack / unpack
#
# Lane placement / extraction goes through the MXU: channel c of z-group
# g is placed at lane 32g+c with a one-hot (32, 128) matmul instead of
# vector lane shuffles (measured: the shuffle form costs ~4 ms at DfM
# shapes, the MXU form is bandwidth-bound).


def _place_mats(dtype):
    e = np.zeros((G, C, L), np.float32)
    for g in range(G):
        e[g, :, g * C:(g + 1) * C] = np.eye(C)
    return jnp.asarray(e, dtype)


def _pack_body(s, e_ref, o_ref, w, wp, th):
    acc = jnp.zeros((th * w, L), jnp.float32)
    for g in range(G):
        acc = acc + jax.lax.dot(s[g].reshape(th * w, C), e_ref[g],
                                preferred_element_type=jnp.float32)
    res = acc.reshape(th, w, L).astype(o_ref.dtype)
    o_ref[0] = jnp.concatenate(
        [res, jnp.zeros((th, wp - w, L), o_ref.dtype)], axis=1)


def _pack_kernel0(xa_ref, e_ref, o_ref, *, w, wp, nh, nbin):
    hi = pl.program_id(1)
    is_pad = (hi == 0) | (hi == nh - 1)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        _pack_body(xa_ref[0], e_ref, o_ref, w, wp, o_ref.shape[1])

    @pl.when(is_pad)
    def _z():
        o_ref[:] = jnp.zeros_like(o_ref)


def _pack_kernel2(xa_ref, xb_ref, e_ref, o_ref, *, w, wp, nh, nbin):
    k = pl.program_id(0)
    hi = pl.program_id(1)
    is_pad = (hi == 0) | (hi == nh - 1)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        # block k holds z = 4k-2 .. 4k+1: [A[2], A[3], B[0], B[1]]
        a = xa_ref[0][2:]
        b = xb_ref[0][:2]
        a = jnp.where(k == 0, 0.0, a.astype(jnp.float32)).astype(a.dtype)
        b = jnp.where(k == nbin, 0.0, b.astype(jnp.float32)
                      ).astype(b.dtype)
        s = jnp.concatenate([a, b], axis=0)
        _pack_body(s, e_ref, o_ref, w, wp, o_ref.shape[1])

    @pl.when(is_pad)
    def _z():
        o_ref[:] = jnp.zeros_like(o_ref)


@functools.partial(jax.jit, static_argnames=('phase', 'th', 'interpret'))
def _pack_call(x, phase=0, th=8, interpret=False):
    d, h, w, c = x.shape
    nb = _npad(d, phase)
    nbin = d // G
    hp = h + 2 * th
    wp = _round_up(w + 1, 16)
    nh = hp // th
    nhi = h // th
    xb = x.reshape(nbin, G, h, w, c)

    def row(hi):
        return jnp.clip(hi - 1, 0, nhi - 1)

    out_spec = pl.BlockSpec((1, th, wp, L), lambda k, hi: (k, hi, 0, 0))
    out_shape = jax.ShapeDtypeStruct((nb, hp, wp, L), x.dtype)
    kw = dict(w=w, wp=wp, nh=nh, nbin=nbin)
    if phase == 0:
        out = pl.pallas_call(
            functools.partial(_pack_kernel0, **kw),
            grid=(nb, nh),
            in_specs=[
                pl.BlockSpec((1, G, th, w, C),
                             lambda k, hi: (k, 0, row(hi), 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(xb, _place_mats(x.dtype))
    else:
        out = pl.pallas_call(
            functools.partial(_pack_kernel2, **kw),
            grid=(nb, nh),
            in_specs=[
                pl.BlockSpec((1, G, th, w, C),
                             lambda k, hi: (jnp.clip(k - 1, 0, nbin - 1),
                                            0, row(hi), 0, 0)),
                pl.BlockSpec((1, G, th, w, C),
                             lambda k, hi: (jnp.clip(k, 0, nbin - 1),
                                            0, row(hi), 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(xb, xb, _place_mats(x.dtype))
    return out


def default_th(h):
    """Row tile for pack_vol: DFM_PACKED_TH env override, else 8.
    (th=16 halves the per-program halo DMA but the double-buffered
    (th+4, WP, 128) input windows then exceed the 16 MB VMEM scoped
    limit at production W; measured th=8 vs th=10 is a wash.)"""
    import os
    env = os.environ.get('DFM_PACKED_TH')
    if env and h % int(env) == 0:
        return int(env)
    return 8


def pack_vol(x, phase=0, th=None, interpret=False):
    """(D, H, W, 32) -> PackedVol via MXU lane placement.

    D % 4 == 0, H % th == 0, W % 16 == 0 required.
    """
    d, h, w, c = x.shape
    if th is None:
        th = default_th(h)
    assert c == C and d % G == 0 and h % th == 0 and w % 16 == 0, x.shape
    return PackedVol(_pack_call(x, phase, th, interpret), phase, d, h, w, th)


def _place_mats_t(dtype):
    e = np.zeros((G, L, C), np.float32)
    for g in range(G):
        e[g, g * C:(g + 1) * C, :] = np.eye(C)
    return jnp.asarray(e, dtype)


def _unpack_kernel(x_ref, e_ref, o_ref, *, w):
    th = o_ref.shape[1]
    x = x_ref[0][:, :w, :].reshape(th * w, L)
    outs = [jax.lax.dot(x, e_ref[g],
                        preferred_element_type=jnp.float32
                        ).reshape(th, w, C) for g in range(G)]
    o_ref[:] = jnp.stack(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('th', 'h', 'w', 'interpret'))
def _unpack_call(data, th, h, w, interpret=False):
    nb, hp, wp, _ = data.shape
    out = pl.pallas_call(
        functools.partial(_unpack_kernel, w=w),
        grid=(nb, h // th),
        in_specs=[pl.BlockSpec((1, th, wp, L),
                               lambda k, hi: (k, hi + 1, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, th, w, C),
                               lambda k, hi: (k, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * G, h, w, C), data.dtype),
        interpret=interpret,
    )(data, _place_mats_t(data.dtype))
    return out


def unpack_vol(pv: PackedVol, interpret=False):
    """PackedVol -> dense (D, H, W, 32)."""
    hi_rows_ok = pv.h % pv.th == 0
    assert hi_rows_ok
    dense = _unpack_call(pv.data, pv.th, pv.h, pv.w, interpret=interpret)
    if pv.phase == 2:
        dense = dense[2:2 + pv.d]
    return dense


def dres0_stats_affine(u_pv: PackedVol, ps, ci, clo, chi, scale, bias,
                       num_groups, eps=1e-5):
    """Fused dres0 exit: y = relu(GN(u + c)) on a packed phase-2 volume.

    `u` is conv_p2p(prev); `c` is the D-constant cur-branch contribution
    of dual_conv3 (ops/band_volume.py): interior slice `ci` everywhere
    except slices 0 / D-1 which are `clo` / `chi` (all (H, W, 32) f32 or
    bf16). GroupNorm statistics of (u + c) are composed exactly from the
    kernel partials plus 2D reductions (no extra volume pass):
        sum(u+c)   = sum(u) + sum_hw(ci*(D-2) + clo + chi)
        sum((u+c)^2) = sum(u^2) + 2*sum(u*c) + sum(c^2)
        sum(u*c)   = sum_hw(zsum(u)*ci + u[0]*(clo-ci) + u[D-1]*(chi-ci))
    where zsum(u) is a lane-group/block reduction of the packed u.
    """
    assert u_pv.phase == 2
    g = num_groups
    d, h, w = u_pv.d, u_pv.h, u_pv.w
    th = u_pv.th
    nb = u_pv.nb
    ud = u_pv.data
    cif = jnp.asarray(ci, jnp.float32)
    clof = jnp.asarray(clo, jnp.float32)
    chif = jnp.asarray(chi, jnp.float32)

    su = ps[..., 0, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
    su2 = ps[..., 1, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
    sc_ = (cif * (d - 2) + clof + chif).sum(axis=(0, 1))
    sc2 = ((cif * cif) * (d - 2) + clof * clof + chif * chif
           ).sum(axis=(0, 1))
    zsum = ud.astype(jnp.float32).reshape(nb, ud.shape[1], ud.shape[2],
                                          G, C).sum(axis=(0, 3))
    zsum = zsum[th:th + h, :w]
    u0 = ud[0, th:th + h, :w, 2 * C:3 * C].astype(jnp.float32)
    ud_ = ud[nb - 1, th:th + h, :w, C:2 * C].astype(jnp.float32)
    suc = (zsum * cif + u0 * (clof - cif) + ud_ * (chif - cif)
           ).sum(axis=(0, 1))

    cnt = d * h * w * (C // g)
    s = (su + sc_).reshape(g, C // g).sum(axis=1)
    s2 = (su2 + 2 * suc + sc2).reshape(g, C // g).sum(axis=1)
    mean = s / cnt
    var = s2 / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, C // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, C // g)
    a = jnp.tile((scale * rstd[:, None]).reshape(C), G)
    b = jnp.tile((bias - mean[:, None] * scale * rstd[:, None]
                  ).reshape(C), G)

    # x = u + c (c broadcast into lanes, edge slices fixed), then the
    # masked affine + relu in one fused XLA pass
    cpad = jnp.pad(cif, ((th, ud.shape[1] - th - h),
                         (0, ud.shape[2] - w), (0, 0)))
    x = ud.astype(jnp.float32) + jnp.tile(cpad, (1, 1, G))[None]
    x = x.at[0, th:th + h, :w, 2 * C:3 * C].add(clof - cif)
    x = x.at[nb - 1, th:th + h, :w, C:2 * C].add(chif - cif)
    pv_x = PackedVol(x, 2, d, h, w, th)
    y = affine_mask(pv_x, a, b, relu=True)
    return PackedVol(y.astype(ud.dtype), 2, d, h, w, th)


def _unpack_ar_kernel(u_ref, ya_ref, yb_ref, sc_ref, bs_ref, e_ref,
                      o_ref, *, w, relu, res):
    th = o_ref.shape[1]
    x = u_ref[0][:, :w, :].astype(jnp.float32) * sc_ref[0] + bs_ref[0]
    if relu:
        x = jnp.maximum(x, 0.0)
    if res:
        r = jnp.concatenate([ya_ref[0][:, :w, 2 * C:],
                             yb_ref[0][:, :w, :2 * C]], axis=-1)
        x = x + r.astype(jnp.float32)
    xf = x.reshape(th * w, L).astype(o_ref.dtype)
    outs = [jax.lax.dot(xf, e_ref[g],
                        preferred_element_type=jnp.float32
                        ).reshape(th, w, C) for g in range(G)]
    o_ref[:] = jnp.stack(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('th', 'h', 'w', 'relu', 'res',
                                             'interpret'))
def _unpack_ar_call(u, y, sc, bs, th, h, w, relu, res, interpret=False):
    nb, hp, wp, _ = u.shape
    if y is None:
        y = u  # unused dummy with compatible blocks
    nby = y.shape[0]
    out = pl.pallas_call(
        functools.partial(_unpack_ar_kernel, w=w, relu=relu, res=res),
        grid=(nb, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, L), lambda k, hi: (k, hi + 1, 0, 0)),
            pl.BlockSpec((1, th, wp, L),
                         lambda k, hi: (jnp.minimum(k, nby - 1),
                                        hi + 1, 0, 0)),
            pl.BlockSpec((1, th, wp, L),
                         lambda k, hi: (jnp.minimum(k + 1, nby - 1),
                                        hi + 1, 0, 0)),
            pl.BlockSpec((1, L), lambda k, hi: (0, 0)),
            pl.BlockSpec((1, L), lambda k, hi: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, th, w, C), lambda k, hi: (k, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * G, h, w, C), u.dtype),
        interpret=interpret,
    )(u, y, y, sc.reshape(1, L), bs.reshape(1, L), _place_mats_t(u.dtype))
    return out


def unpack_affine_res(u_pv: PackedVol, ps, scale, bias, num_groups,
                      res_pv: PackedVol = None, relu=False, eps=1e-5,
                      zw=None, interpret=False):
    """Fused chain exit: dense = [relu](GN_affine(u)) (+ res).

    Finishes GroupNorm from `ps` partials and unpacks in one kernel.
    `res_pv` (optional) must be the OPPOSITE phase of `u_pv` (the conv
    input, e.g. dres1's `GN(conv(y)) + y`): its values are recombined
    to u's block alignment in-kernel. With a residual, u_pv must be
    phase 0 (so the residual phase-2 neighbor blocks k, k+1 both
    exist); without one, phase 2 is also accepted (the z-pad slices
    are cut after the unpack). `zw` (d,) = per-z-slice multiplicity
    weights for the GN stats (reduced-depth volumes).
    """
    assert u_pv.phase == 0 or res_pv is None, \
        'unpack_affine_res residuals want a phase-0 conv output'
    g = num_groups
    if zw is not None:
        s, s2, wsum = fold_ps_weighted(ps, zw, u_pv.phase, u_pv.d)
        cnt = wsum * u_pv.h * u_pv.w * (C // g)
    else:
        s = ps[..., 0, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
        s2 = ps[..., 1, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
        cnt = u_pv.d * u_pv.h * u_pv.w * (C // g)
    mean = s.reshape(g, C // g).sum(axis=1) / cnt
    var = s2.reshape(g, C // g).sum(axis=1) / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, C // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, C // g)
    sc = jnp.tile((scale * rstd[:, None]).reshape(C), G)
    bs = jnp.tile((bias - mean[:, None] * scale * rstd[:, None]
                   ).reshape(C), G)
    y = None if res_pv is None else res_pv.data
    dense = _unpack_ar_call(u_pv.data, y, sc, bs, u_pv.th, u_pv.h,
                            u_pv.w, bool(relu), res_pv is not None,
                            interpret=interpret)
    if u_pv.phase == 2:
        dense = dense[2:2 + u_pv.d]
    return dense


# ---------------------------------------------------------------------------
# stride-2 conv from packed input (the hourglass entry): a 3^3 stride-2
# 'same' conv consuming a packed (4x32) volume and writing a DENSE
# half-resolution C=64 volume + GroupNorm partial moments. Out lanes
# hold an (z2-pair, 64ch) pairing, so every matmul is full-lane; the
# W stride is folded into a column-parity split of the input buffer
# (each tap then reads one parity at stride 1).


def pack_weights_s2(kernel, phase):
    """(3, 3, 3, 32, 64) -> (wa, wb) each (9, 128, 128) z-banded for the
    stride-2 conv. Out lane = g2 * 64 + co for out z2 = 2*k2 + g2; in
    lane = g * 32 + ci. Valid taps: dz = 4*delta + g - 2*g2 + 1 - phase
    with delta = -1/0 for phase 0 (wa = block k2-1, wb = k2) and
    delta = 0/+1 for phase 2 (wa = k2, wb = k2+1)."""
    k = jnp.asarray(kernel, jnp.float32)
    assert k.shape == (3, 3, 3, C, 2 * C), k.shape
    wa = jnp.zeros((9, L, L), jnp.float32)
    wb = jnp.zeros((9, L, L), jnp.float32)
    d_a = -1 if phase == 0 else 0
    for g in range(G):
        for g2 in range(2):
            sl = (slice(g * C, (g + 1) * C),
                  slice(g2 * 2 * C, (g2 + 1) * 2 * C))
            dz_a = 4 * d_a + g - 2 * g2 + 1 - phase
            dz_b = dz_a + 4
            for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                         for dx in range(3)):
                if 0 <= dz_a < 3:
                    wa = wa.at[t, sl[0], sl[1]].set(k[dz_a, dy, dx])
                if 0 <= dz_b < 3:
                    wb = wb.at[t, sl[0], sl[1]].set(k[dz_b, dy, dx])
    return wa, wb


def _conv_s2_kernel(x_ref, wa_ref, wb_ref, out_ref, ps_ref, bufs, sems, *,
                    nh2, th2, wp, th_in, w2, nbin, nb2, off_a):
    k2 = pl.program_id(0)
    hi = pl.program_id(1)
    p = k2 * nh2 + hi
    n = nb2 * nh2
    slot = jax.lax.rem(p, 2)
    win = 2 * th2 + 6
    wp2 = wp // 2

    def issue(prog, sl):
        kk = prog // nh2
        hh = jax.lax.rem(prog, nh2)
        ka = jnp.clip(kk + off_a, 0, nbin - 1)
        kb = jnp.clip(kk + off_a + 1, 0, nbin - 1)
        s0 = th_in + 2 * hh * th2 - 4
        ca = pltpu.make_async_copy(x_ref.at[ka, pl.ds(s0, win)],
                                   bufs.at[sl, 0], sems.at[sl, 0])
        cb = pltpu.make_async_copy(x_ref.at[kb, pl.ds(s0, win)],
                                   bufs.at[sl, 1], sems.at[sl, 1])
        return ca, cb

    @pl.when(p == 0)
    def _first():
        for c in issue(0, 0):
            c.start()

    @pl.when(p + 1 < n)
    def _next():
        for c in issue(p + 1, jax.lax.rem(p + 1, 2)):
            c.start()

    for c in issue(p, slot):
        c.wait()

    @pl.when(k2 + off_a < 0)
    def _za():
        bufs[slot, 0] = jnp.zeros_like(bufs[slot, 0])

    @pl.when(k2 + off_a + 1 > nbin - 1)
    def _zb():
        bufs[slot, 1] = jnp.zeros_like(bufs[slot, 1])

    # W is computed at stride 1 (all wp positions; the real out cols
    # are the even ones, subsampled by the XLA wrapper) because Mosaic
    # has no sublane-strided select; the H stride-2 select is free on
    # the untiled leading dim via an even/odd reshape.
    nrows = th2 * wp
    acc = jnp.zeros((nrows, L), jnp.float32)
    for blk in range(2):
        f = bufs[slot, blk]                        # (win, wp, 128)
        half = f.reshape((2 * th2 + 6) // 2, 2, wp, L)
        ev = half[:, 0]                            # rows 0, 2, 4, ...
        od = half[:, 1]                            # rows 1, 3, 5, ...
        wref = wa_ref if blk == 0 else wb_ref
        for dy in range(3):
            # out row j reads input window row 2j + dy + 3 (sel[1 + j]);
            # one guard row each side for the dx -1/+1 flatten wraps
            if dy == 0:
                sel = od[0:th2 + 2]                # odd rows 1, 3, ...
            elif dy == 1:
                sel = ev[1:th2 + 3]                # even rows 2, 4, ...
            else:
                sel = od[1:th2 + 3]                # odd rows 3, 5, ...
            fsel = sel.reshape((th2 + 2) * wp, L)
            for dx in range(3):
                t = dy * 3 + dx
                acc = acc + jax.lax.dot(
                    fsel[wp + dx - 1:wp + dx - 1 + nrows], wref[t],
                    preferred_element_type=jnp.float32)

    accw = acc.reshape(th2, wp, L)
    col = jax.lax.broadcasted_iota(jnp.int32, (th2, wp, L), 1)
    valid = (col < 2 * w2) & (jax.lax.rem(col, 2) == 0)
    accw = jnp.where(valid, accw, 0.0)
    af = accw.reshape(nrows, L)
    ps_ref[0, 0, 0, :] = jnp.sum(af, axis=0)
    ps_ref[0, 0, 1, :] = jnp.sum(af * af, axis=0)
    out_ref[0, 0] = accw[:, :, :2 * C].astype(out_ref.dtype)
    out_ref[0, 1] = accw[:, :, 2 * C:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('th2', 'd2', 'h2', 'w2',
                                              'th_in', 'off_a', 'interpret'))
def _conv_s2_call(data, wa, wb, th2, d2, h2, w2, th_in, off_a,
                  interpret=False):
    nbin, hp, wp, _ = data.shape
    nh2 = h2 // th2
    nb2 = (d2 + 1) // 2
    kern = functools.partial(
        _conv_s2_kernel, nh2=nh2, th2=th2, wp=wp, th_in=th_in, w2=w2,
        nbin=nbin, nb2=nb2, off_a=off_a)
    out, ps = pl.pallas_call(
        kern,
        grid=(nb2, nh2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, th2, wp, 2 * C),
                         lambda k2, hi: (k2, 0, hi, 0, 0)),
            pl.BlockSpec((1, 1, 2, L), lambda k2, hi: (k2, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb2, 2, h2, wp, 2 * C), data.dtype),
            jax.ShapeDtypeStruct((nb2, nh2, 2, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2 * th2 + 6, wp, L), data.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(data, wa.astype(data.dtype), wb.astype(data.dtype))
    return out, ps


def conv_s2_p2d(pv: PackedVol, kernel, th2=8, interpret=False):
    """3^3 stride-2 'same' conv: packed (4x32) in -> DENSE half-res
    (D2, H2, W2, 64) out (+ partial moments (NB2, NH2, 2, 128), lane
    l = (z2 parity l // 64, channel l % 64)).

    The hourglass entry conv (models/layers.py Hourglass ConvNorm_0;
    reference dfm_backbone.py hourglass conv1). D, H even; H2 % th2 == 0.
    """
    d2, h2, w2 = pv.d // 2, pv.h // 2, pv.w // 2
    # d2 must be even too: with odd d2 the last grid block recomputes a
    # clamped z2 slice whose sums would pollute the ps partial moments
    # even though the wrapper trims out[:d2].
    assert pv.d % 4 == 0 and pv.h % 2 == 0 and h2 % th2 == 0
    wa, wb = pack_weights_s2(kernel, pv.phase)
    off_a = -1 if pv.phase == 0 else 0
    out, ps = _conv_s2_call(pv.data, wa, wb, th2, d2, h2, w2, pv.th,
                            off_a, interpret=interpret)
    # the kernel computes all W positions (no sublane-strided select in
    # Mosaic); the real half-res columns are the even ones
    out = out.reshape(((d2 + 1) // 2) * 2, h2, pv.wp,
                      2 * C)[:d2, :, 0:2 * w2:2]
    return out, ps


def gn_dense_from_partials(x, ps, count, scale, bias, num_groups,
                           eps=1e-5, relu=True, cout=2 * C, zw=None,
                           d=None):
    """Finish GroupNorm on a dense volume from kernel partial moments
    (per-lane sums folded to per-channel). `count` = number of
    elements per channel over the normalized region (with `zw`:
    per-z-slice-weighted count = sum(zw) * H * W)."""
    g = num_groups
    if zw is not None:
        s, s2, _ = fold_ps_weighted(ps, zw, 0, d, cw=cout)
    else:
        s = ps[..., 0, :].sum(axis=tuple(range(ps.ndim - 2))
                              ).reshape(-1, cout).sum(axis=0)
        s2 = ps[..., 1, :].sum(axis=tuple(range(ps.ndim - 2))
                               ).reshape(-1, cout).sum(axis=0)
    cnt = count * (cout // g)
    mean = s.reshape(g, cout // g).sum(axis=1) / cnt
    var = s2.reshape(g, cout // g).sum(axis=1) / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, cout // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, cout // g)
    sc = (scale * rstd[:, None]).reshape(cout)
    bs = (bias - mean[:, None] * scale * rstd[:, None]).reshape(cout)
    y = x.astype(jnp.float32) * sc + bs
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# packed-exit affine (+ cross-phase residual) — the dres1 exit that
# STAYS packed so the hourglass entry can consume it without a relayout


def _affine_res_kernel(u_ref, ya_ref, yb_ref, sc_ref, bs_ref, o_ref, *,
                       w, nh, relu, res):
    hi = pl.program_id(1)
    is_pad = (hi == 0) | (hi == nh - 1)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        x = u_ref[0].astype(jnp.float32) * sc_ref[0] + bs_ref[0]
        if relu:
            x = jnp.maximum(x, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < w, x, 0.0)
        if res:
            r = jnp.concatenate([ya_ref[0][:, :, 2 * C:],
                                 yb_ref[0][:, :, :2 * C]], axis=-1)
            x = x + r.astype(jnp.float32)
        o_ref[0] = x.astype(o_ref.dtype)

    @pl.when(is_pad)
    def _z():
        o_ref[:] = jnp.zeros_like(o_ref)


@functools.partial(jax.jit, static_argnames=('th', 'h', 'w', 'relu', 'res',
                                             'interpret'))
def _affine_res_call(u, y, sc, bs, th, h, w, relu, res, interpret=False):
    nb, hp, wp, _ = u.shape
    if y is None:
        y = u
    nby = y.shape[0]
    nh = hp // th

    def row(hi):
        return jnp.clip(hi, 1, h // th)

    out = pl.pallas_call(
        functools.partial(_affine_res_kernel, w=w, nh=nh, relu=relu,
                          res=res),
        grid=(nb, nh),
        in_specs=[
            pl.BlockSpec((1, th, wp, L), lambda k, hi: (k, row(hi), 0, 0)),
            pl.BlockSpec((1, th, wp, L),
                         lambda k, hi: (jnp.minimum(k, nby - 1),
                                        row(hi), 0, 0)),
            pl.BlockSpec((1, th, wp, L),
                         lambda k, hi: (jnp.minimum(k + 1, nby - 1),
                                        row(hi), 0, 0)),
            pl.BlockSpec((1, L), lambda k, hi: (0, 0)),
            pl.BlockSpec((1, L), lambda k, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wp, L),
                               lambda k, hi: (k, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, hp, wp, L), u.dtype),
        interpret=interpret,
    )(u, y, y, sc.reshape(1, L), bs.reshape(1, L))
    return out


def gn_affine_res_packed(u_pv: PackedVol, ps, scale, bias, num_groups,
                         res_pv: PackedVol = None, relu=False, eps=1e-5,
                         interpret=False):
    """Like `unpack_affine_res` but the result STAYS packed (phase 0):
    y = [relu](GN_affine(u)) (+ res recombined from the opposite
    phase). Rows outside the valid tile keep their stored zeros (the
    kernel grid only touches valid row tiles)."""
    assert u_pv.phase == 0
    g = num_groups
    s = ps[..., 0, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
    s2 = ps[..., 1, :].sum(axis=(0, 1)).reshape(G, C).sum(axis=0)
    cnt = u_pv.d * u_pv.h * u_pv.w * (C // g)
    mean = s.reshape(g, C // g).sum(axis=1) / cnt
    var = s2.reshape(g, C // g).sum(axis=1) / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = jnp.asarray(scale, jnp.float32).reshape(g, C // g)
    bias = jnp.asarray(bias, jnp.float32).reshape(g, C // g)
    sc = jnp.tile((scale * rstd[:, None]).reshape(C), G)
    bs = jnp.tile((bias - mean[:, None] * scale * rstd[:, None]
                   ).reshape(C), G)
    y = None if res_pv is None else res_pv.data
    out = _affine_res_call(u_pv.data, y, sc, bs, u_pv.th, u_pv.h,
                           u_pv.w, bool(relu), res_pv is not None,
                           interpret=interpret)
    return PackedVol(out, 0, u_pv.d, u_pv.h, u_pv.w, u_pv.th)


# ---------------------------------------------------------------------------
# 8-parity pack: interleave the transpose-conv parity outputs
# (convt1_parity below) straight into the packed layout, with fused
# GroupNorm partial moments — the hourglass exit never materializes a
# dense full-res volume.


def _pack_zpair_kernel(z0_ref, z1_ref, e_ref, o_ref, ps_ref, *, w, wp,
                       nh):
    hi = pl.program_id(1)
    is_pad = (hi == 0) | (hi == nh - 1)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        th = o_ref.shape[1]
        # lane group g holds z = 4k + g: parity r = g % 2, m = 2k + g//2
        order = (z0_ref[0, 0], z1_ref[0, 0], z0_ref[0, 1], z1_ref[0, 1])
        acc = jnp.zeros((th * w, L), jnp.float32)
        for g in range(G):
            acc = acc + jax.lax.dot(
                order[g].reshape(th * w, C), e_ref[g],
                preferred_element_type=jnp.float32)
        ps_ref[0, 0, 0, :] = jnp.sum(acc, axis=0)
        ps_ref[0, 0, 1, :] = jnp.sum(acc * acc, axis=0)
        res = acc.reshape(th, w, L).astype(o_ref.dtype)
        o_ref[0] = jnp.concatenate(
            [res, jnp.zeros((th, wp - w, L), o_ref.dtype)], axis=1)

    @pl.when(is_pad)
    def _z():
        o_ref[:] = jnp.zeros_like(o_ref)
        ps_ref[:] = jnp.zeros_like(ps_ref)


@functools.partial(jax.jit, static_argnames=('th', 'interpret'))
def _pack_zpair_call(z0, z1, th=8, interpret=False):
    d2, h, w, c = z0.shape
    nb = d2 // 2
    hp = h + 2 * th
    wp = _round_up(w + 1, 16)
    nh = hp // th
    nhi = h // th
    z0b = z0.reshape(nb, 2, h, w, c)
    z1b = z1.reshape(nb, 2, h, w, c)

    def row(hi):
        return jnp.clip(hi - 1, 0, nhi - 1)

    out, ps = pl.pallas_call(
        functools.partial(_pack_zpair_kernel, w=w, wp=wp, nh=nh),
        grid=(nb, nh),
        in_specs=[
            pl.BlockSpec((1, 2, th, w, C),
                         lambda k, hi: (k, 0, row(hi), 0, 0)),
            pl.BlockSpec((1, 2, th, w, C),
                         lambda k, hi: (k, 0, row(hi), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wp, L), lambda k, hi: (k, hi, 0, 0)),
            pl.BlockSpec((1, 1, 2, L), lambda k, hi: (k, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, hp, wp, L), z0.dtype),
            jax.ShapeDtypeStruct((nb, nh, 2, L), jnp.float32),
        ],
        interpret=interpret,
    )(z0b, z1b, _place_mats(z0.dtype))
    return out, ps


def pack_parity8(par, th=8, interpret=False):
    """(8, D2, H2, W2, 32) parity sub-volumes (index p = 4*rz + 2*ry +
    rx from `convt1_parity`) -> (PackedVol phase 0 of the interleaved
    (2D2, 2H2, 2W2, 32) volume, partial moments (NB, NH, 2, 128)).

    The H/W interleaves run in XLA (stack+reshape with C minor —
    contiguous copies at memory bandwidth); only the z-lane placement
    needs the MXU pack kernel (Mosaic has no sublane shuffles)."""
    d2, h2, w2, c = par.shape[1:]
    assert d2 % 2 == 0 and (2 * h2) % th == 0
    p = par.reshape(2, 2, 2, d2, h2, w2, c)
    # x then y interleave: (rz, d2, h2, 2, w2, 2, c) -> full H, W
    p = p.transpose(0, 3, 4, 1, 5, 2, 6)       # (rz, d2, h2, ry, w2, rx, c)
    zpar = p.reshape(2, d2, 2 * h2, 2 * w2, c)
    data, ps = _pack_zpair_call(zpar[0], zpar[1], th=th,
                                interpret=interpret)
    return (PackedVol(data, 0, 2 * d2, 2 * h2, 2 * w2, th), ps)


def convt1_parity(x, kernel):
    """ConvTransposeNorm's transposed conv (torch k3/s2/p1/op1
    semantics; models/layers.py ConvTransposeNorm) as 27 half-res
    matmul taps accumulated into 8 parity sub-volumes.

    x: (D2, H2, W2, Cin); kernel: (3, 3, 3, Cin, Cout) in
    nn.ConvTranspose layout. Returns (8, D2, H2, W2, Cout) with index
    p = 4*rz + 2*ry + rx: out[2m+rz, 2n+ry, 2t+rx] = par[p, m, n, t].

    Per dim, parity 0 uses tap k[1] at src offset 0; parity 1 uses
    k[0] at offset 0 and k[2] at offset +1 (y[2m+1] = x[m]*k[0] +
    x[m+1]*k[2]; flax ConvTranspose does not flip the kernel).
    """
    d2, h2, w2, cin = x.shape
    cout = kernel.shape[-1]
    k = jnp.asarray(kernel, x.dtype)
    taps = {0: ((1, 0),), 1: ((0, 0), (2, 1))}
    outs = []
    for rz in range(2):
        for ry in range(2):
            for rx in range(2):
                acc = jnp.zeros((d2, h2, w2, cout), jnp.float32)
                for kz, oz in taps[rz]:
                    for ky, oy in taps[ry]:
                        for kx, ox in taps[rx]:
                            src = x
                            if oz or oy or ox:
                                src = jnp.pad(
                                    x, ((0, oz), (0, oy), (0, ox),
                                        (0, 0))
                                )[oz:, oy:, ox:]
                            acc = acc + jnp.einsum(
                                'dhwc,co->dhwo', src, k[kz, ky, kx],
                                preferred_element_type=jnp.float32)
                outs.append(acc.astype(x.dtype))
    return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------------------
# pure-jnp references (tests / CPU fallback)


def pack_vol_ref(x, phase=0, th=8):
    d, h, w, c = x.shape
    wp = _round_up(w + 1, 16)
    zlo = 2 if phase == 2 else 0
    zhi = G * _npad(d, phase) - d - zlo
    xp = jnp.pad(x, ((zlo, zhi), (th, th), (0, wp - w), (0, 0)))
    nb = _npad(d, phase)
    hp = xp.shape[1]
    data = xp.reshape(nb, G, hp, wp, c).transpose(0, 2, 3, 1, 4) \
        .reshape(nb, hp, wp, L)
    return PackedVol(data, phase, d, h, w, th)


def unpack_vol_ref(pv: PackedVol):
    nb, hp, wp, _ = pv.data.shape
    dense = pv.data.reshape(nb, hp, wp, G, C).transpose(0, 3, 1, 2, 4) \
        .reshape(nb * G, hp, wp, C)
    zlo = 2 if pv.phase == 2 else 0
    return dense[zlo:zlo + pv.d, pv.th:pv.th + pv.h, :pv.w]
