"""Conv3D lowering experiments on the real chip (chained timing).

Variants of the same logical 3x3x3 conv (C_in -> C_out) at DfM cost-
volume shapes, measured in TFLOP/s. The question: which lowering gets
narrow-channel 3D convs closest to MXU peak?

  direct   nn.Conv 3D as-is
  zsum     k z-shifted 2D convs, summed (current Conv3DSum)
  zcat     z-shifts concatenated along channels -> one (ky,kx) 2D conv
           with C_in*kz input channels (contraction 3x wider)
  zycat    z- and y-shifts concatenated -> one (1,kx) conv, C_in*9
  im2col   all 27 taps concatenated -> 1x1 conv, contraction C_in*27

Usage: python tools/convbench.py [variant ...] [--c C] [--shape D,H,W]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    variants = args or ['zsum', 'zcat', 'zycat', 'im2col']
    cin = cout = 32
    d, h, w = 72, 80, 320
    for a in sys.argv[1:]:
        if a.startswith('--c='):
            cin = cout = int(a[4:])
        if a.startswith('--shape='):
            d, h, w = map(int, a[8:].split(','))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, d, h, w, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.05
                    ).astype(jnp.bfloat16)
    flops = 2 * d * h * w * 27 * cin * cout
    dn2 = ('NHWC', 'HWIO', 'NHWC')

    def shift_z(xp, dz):  # xp padded in z
        return xp[:, dz:dz + d]

    for v in variants:
        if v == 'direct':
            def f(x, k):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        elif v == 'zsum':
            def f(x, k):
                xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                out = None
                for dz in range(3):
                    flat = shift_z(xp, dz).reshape(d, h, w, cin)
                    o = jax.lax.conv_general_dilated(
                        flat, k[dz], (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=dn2,
                        preferred_element_type=jnp.float32)
                    out = o if out is None else out + o
                return out.astype(jnp.bfloat16)
        elif v == 'zcat':
            def f(x, k):
                xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                cat = jnp.concatenate([shift_z(xp, dz) for dz in range(3)],
                                      axis=-1).reshape(d, h, w, 3 * cin)
                kk = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * cin, cout)
                return jax.lax.conv_general_dilated(
                    cat, kk, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        elif v == 'zycat':
            def f(x, k):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
                cat = jnp.concatenate(
                    [xp[:, dz:dz + d, dy:dy + h] for dz in range(3)
                     for dy in range(3)], axis=-1).reshape(d, h, w, 9 * cin)
                kk = k.transpose(2, 0, 1, 3, 4).reshape(3, 9 * cin, cout)
                return jax.lax.conv_general_dilated(
                    cat, kk[None], (1, 1), [(0, 0), (1, 1)],
                    dimension_numbers=dn2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        elif v == 'im2col':
            def f(x, k):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
                cat = jnp.concatenate(
                    [xp[:, dz:dz + d, dy:dy + h, dx:dx + w]
                     for dz in range(3) for dy in range(3)
                     for dx in range(3)], axis=-1)
                kk = k.reshape(27 * cin, cout)
                return jnp.einsum('bdhwc,co->bdhwo', cat, kk,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
        elif v == 'zgroup':
            # regroup z into lanes: (D,H,W,C) -> (D/4,H,W,4C); the 3x3x3
            # conv becomes a 3x3 2D conv over 3 z-groups (dense 384->128
            # weight, banded-zero pattern => 4x redundant FLOPs but full
            # MXU occupancy)
            g = 4
            dg = d // g
            # dense weight (3,3, 3*g*cin, g*cout): out slice j of a
            # group needs input slices r = g + j - 1 + dz of the
            # 3-group window (r in [0, 3g)); lane block r*cin
            kk = np.zeros((3, 3, 3 * g * cin, g * cout), np.float32)
            kf = rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.05
            for j in range(g):
                for dz in range(3):
                    r = g + j - 1 + dz
                    kk[:, :, r * cin:(r + 1) * cin,
                       j * cout:(j + 1) * cout] = kf[dz]
            kk = jnp.asarray(kk).astype(jnp.bfloat16)

            def f(x, kk):
                xg = x.reshape(1, dg, g, h, w, cin).transpose(
                    0, 1, 3, 4, 2, 5).reshape(1, dg, h, w, g * cin)
                xp = jnp.pad(xg, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                cat = jnp.concatenate([xp[:, dz:dz + dg] for dz in range(3)],
                                      axis=-1).reshape(dg, h, w, 3 * g * cin)
                o = jax.lax.conv_general_dilated(
                    cat, kk, (1, 1),
                    [(1, 1), (1, 1)], dimension_numbers=dn2,
                    preferred_element_type=jnp.float32)
                return o.astype(jnp.bfloat16)
            t = chain_time(f, (x, kk))
            print(f'{v:8s} c={cin:3d} {d}x{h}x{w}: {t * 1e3:7.2f} ms '
                  f'{flops / t / 1e12:6.1f} TFLOP/s')
            continue
        elif v.startswith('wgroup'):
            # regroup W into lanes: (D,H,W,C) -> (D,H,W/g,gC) — a FREE
            # reshape (W,C are the two trailing contiguous axes, unlike
            # zgroup's transpose). The 3x3x3 conv becomes a 3x3x3 conv
            # over w-groups with a dense (gC -> gC) weight carrying a
            # banded-zero pattern: g x redundant FLOPs, full-width lanes.
            g = int(v[6:] or 2)
            wg = w // g
            kk = np.zeros((3, 3, 3, g * cin, g * cout), np.float32)
            kf = np.asarray(k, np.float32)
            for j in range(g):          # output slice within group
                for t in range(3):      # w-group tap
                    for r in range(g):  # input slice within group
                        dx = (t - 1) * g + r - j + 1
                        if 0 <= dx < 3:
                            kk[:, :, t, r * cin:(r + 1) * cin,
                               j * cout:(j + 1) * cout] = kf[:, :, dx]
            kk = jnp.asarray(kk).astype(jnp.bfloat16)
            flops_g = 2 * d * h * wg * 27 * (g * cin) * (g * cout)

            def f(x, kk, g=g, wg=wg):
                xg = x.reshape(1, d, h, wg, g * cin)
                o = jax.lax.conv_general_dilated(
                    xg, kk, (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
                    preferred_element_type=jnp.float32)
                return o.astype(jnp.bfloat16)
            t = chain_time(f, (x, kk))
            print(f'{v:8s} c={cin:3d} {d}x{h}x{w}: {t * 1e3:7.2f} ms '
                  f'{flops / t / 1e12:6.1f} TFLOP/s useful '
                  f'({flops_g / t / 1e12:6.1f} dense)')
            continue
        elif v.startswith('wzcat'):
            # wgroup + z-cat: z-shifts widen the contraction 3x, W-groups
            # widen both operands g x -> one (3,3) 2D conv with
            # (3*g*cin -> g*cout) dense weight.
            g = int(v[5:] or 2)
            wg = w // g
            kf = np.asarray(k, np.float32)
            kk = np.zeros((3, 3, 3 * g * cin, g * cout), np.float32)
            for j in range(g):
                for t in range(3):
                    for r in range(g):
                        dx = (t - 1) * g + r - j + 1
                        if 0 <= dx < 3:
                            for dz in range(3):
                                ci = (r * 3 + dz) * cin
                                kk[:, t, ci:ci + cin,
                                   j * cout:(j + 1) * cout] = kf[dz, :, dx]
            kk = jnp.asarray(kk).astype(jnp.bfloat16)
            flops_g = 2 * d * h * wg * 9 * (3 * g * cin) * (g * cout)

            def f(x, kk, g=g, wg=wg):
                xg = x.reshape(1, d, h, wg, g * cin)
                xp = jnp.pad(xg, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                cat = jnp.concatenate(
                    [xp[:, dz:dz + d] for dz in range(3)], axis=-1)
                # lane order per group slot r: (r, dz, cin) — rearrange
                cat = cat.reshape(d, h, wg, 3, g, cin).transpose(
                    0, 1, 2, 4, 3, 5).reshape(d, h, wg, 3 * g * cin)
                o = jax.lax.conv_general_dilated(
                    cat, kk, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn2,
                    preferred_element_type=jnp.float32)
                return o.astype(jnp.bfloat16)
            t = chain_time(f, (x, kk))
            print(f'{v:8s} c={cin:3d} {d}x{h}x{w}: {t * 1e3:7.2f} ms '
                  f'{flops / t / 1e12:6.1f} TFLOP/s useful '
                  f'({flops_g / t / 1e12:6.1f} dense)')
            continue
        elif v == 'conv2d':
            big_c = 128
            x2 = jnp.asarray(rng.randn(1, d * h // 4, w, big_c)
                             .astype(np.float32)).astype(jnp.bfloat16)
            k2 = jnp.asarray(rng.randn(3, 3, big_c, big_c).astype(np.float32)
                             * 0.05).astype(jnp.bfloat16)
            flops2 = 2 * (d * h // 4) * w * 9 * big_c * big_c

            def f2(x2, k2):
                return jax.lax.conv_general_dilated(
                    x2, k2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            t = chain_time(f2, (x2, k2))
            print(f'{v:8s} c={big_c:3d} {d * h // 4}x{w}: {t * 1e3:7.2f} ms '
                  f'{flops2 / t / 1e12:6.1f} TFLOP/s')
            continue
        else:
            print(f'{v}: unknown', file=sys.stderr)
            continue
        t = chain_time(f, (x, k))
        print(f'{v:8s} c={cin:3d} {d}x{h}x{w}: {t * 1e3:7.2f} ms '
              f'{flops / t / 1e12:6.1f} TFLOP/s')


if __name__ == '__main__':
    main()
