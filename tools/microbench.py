"""Stage microbenchmarks on the real TPU chip (chained-timing method).

Usage: python tools/microbench.py [stage ...]
Stages: atten_packed atten_hat stereo_gather stereo_gather_bf16 cost_warp
        hourglass sem_gather

Each stage times one DfM-production-shape invocation by chaining N
iterations inside a single jit (zero-scaled dependency serializes them)
and differencing two chain lengths (NOTES.md: block_until_ready through
the tunnel returns early; RTT must be cancelled).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, n_short=2, n_long=10, reps=3):
    """Times fn(*args) -> scalar-reducible pytree; returns seconds/iter."""
    import jax
    import jax.numpy as jnp

    def chained(n, *args):
        def body(i, carry):
            # NOTE: cast the perturbation to a.dtype — bf16 + f32 scalar
            # promotes to f32, which silently flips dtype-gated code
            # paths inside fn (e.g. the Pallas cost-warp kernel)
            out = fn(*(a + (carry * 1e-30).astype(a.dtype)
                       if isinstance(a, jnp.ndarray) and
                       jnp.issubdtype(a.dtype, jnp.floating) else a
                       for a in args))
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return s.astype(jnp.float32) * 0 + carry * 0 + s * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    short = jax.jit(functools.partial(chained, n_short))
    long_ = jax.jit(functools.partial(chained, n_long))
    float(short(*args))
    float(long_(*args))

    def timed(f):
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(long_) - timed(short)) / (n_long - n_short)


def dfm_shapes():
    """Production DfM-KITTI shapes."""
    import jax.numpy as jnp
    from dfm_tpu.models import DfMConfig
    from dfm_tpu.ops.frustum import project_voxels_to_frustum

    cfg = DfMConfig()
    d = cfg.num_downsampled_bins          # 72
    h, w = 80, 320
    pad_shape = (320, 1280)
    nz, ny, nx = cfg.voxel_grid_size()    # 20, 304, 288
    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.randn(d, h, w).astype(np.float32))
    vol = jnp.asarray(rng.randn(d, h, w, cfg.cv_channels)
                      .astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 721.5
    cam[0, 2], cam[1, 2] = 640, 160
    pcr = cfg.point_cloud_range
    vs = cfg.voxel_size
    zs = (np.arange(nz) + 0.5) * vs[2] + pcr[2]
    ys = (np.arange(ny) + 0.5) * vs[1] + pcr[1]
    xs = (np.arange(nx) + 0.5) * vs[0] + pcr[0]
    coors = np.stack(np.meshgrid(xs, ys, zs, indexing='ij'), -1)
    coors = jnp.asarray(np.transpose(coors, (2, 1, 0, 3))
                        .astype(np.float32))          # (nz, ny, nx, 3)
    coord_img = project_voxels_to_frustum(coors, jnp.asarray(cam))
    return cfg, cost, vol, coord_img, pad_shape


def main():
    import jax
    import jax.numpy as jnp
    from dfm_tpu.ops import frustum, packed_sample as PS

    stages = sys.argv[1:] or ['atten_packed', 'atten_hat']
    cfg, cost, vol, coord_img, pad_shape = dfm_shapes()
    dmin, dmax = cfg.depth_min, cfg.depth_max
    print(f'backend={jax.default_backend()} '
          f'queries={int(np.prod(coord_img.shape[:-1]))}', file=sys.stderr)

    for s in stages:
        if s == 'atten_packed':
            def f(cost, coord_img):
                packed = frustum.build_packed_fine_softmax(
                    cost, 4, pad_shape, dtype=jnp.bfloat16)
                return frustum.sample_fine_softmax_packed(
                    packed, coord_img, pad_shape, dmin, dmax, 4)
            t = chain_time(f, (cost, coord_img))
        elif s == 'atten_hat':
            def f(cost, coord_img):
                b27, lse4 = frustum.build_base27_tables(
                    cost, 4, pad_shape, dtype=jnp.bfloat16, pad_lanes=64)
                return frustum.sample_softmax_base27_hat(
                    b27, lse4, coord_img, pad_shape, dmin, dmax, 4)
            t = chain_time(f, (cost, coord_img))
        elif s == 'atten_gather_only':
            b27, lse4 = jax.jit(lambda c: frustum.build_base27_tables(
                c, 4, pad_shape, dtype=jnp.bfloat16))(cost)
            d, h, w = b27.shape[:3]
            h_f, w_f = lse4.shape[:2]
            def f(b27, lse4, coord_img):
                u, v, dep = (coord_img[..., 0], coord_img[..., 1],
                             coord_img[..., 2])
                x_f = u / (pad_shape[1] - 1) * (w_f - 1)
                y_f = v / (pad_shape[0] - 1) * (h_f - 1)
                xi0 = jnp.clip(jnp.floor(x_f), 0, w_f - 1).astype(jnp.int32)
                yi0 = jnp.clip(jnp.floor(y_f), 0, h_f - 1).astype(jnp.int32)
                sx = (w - 1) / (w_f - 1)
                sy = (h - 1) / (h_f - 1)
                z_f = (dep - dmin) / (dmax - dmin) * (d * 4 - 1)
                zi0 = jnp.clip(jnp.floor(z_f), 0, d * 4 - 1)
                bx0 = jnp.floor(xi0 * sx).astype(jnp.int32)
                by0 = jnp.floor(yi0 * sy).astype(jnp.int32)
                bz0 = jnp.floor(zi0 * ((d - 1) / (d * 4 - 1))).astype(
                    jnp.int32)
                rows27 = jnp.take(b27.reshape(d * h * w, -1),
                                  (bz0 * h + by0) * w + bx0, axis=0)
                lrows = jnp.take(lse4.reshape(h_f * w_f, 4),
                                 yi0 * w_f + xi0, axis=0)
                return rows27.astype(jnp.float32).sum(-1) + lrows.sum(-1)
            t = chain_time(f, (b27, lse4, coord_img))
        elif s == 'atten_hat_gathers':
            def f(cost, coord_img):
                b27, lse4 = frustum.build_base27_tables(
                    cost, 4, pad_shape, dtype=jnp.bfloat16, pad_lanes=64)
                d, h, w = b27.shape[:3]
                h_f, w_f = lse4.shape[:2]
                d_f = d * 4
                u, v, dep = (coord_img[..., 0], coord_img[..., 1],
                             coord_img[..., 2])
                x_f = u / (pad_shape[1] - 1) * (w_f - 1)
                y_f = v / (pad_shape[0] - 1) * (h_f - 1)
                z_f = (dep - dmin) / (dmax - dmin) * (d_f - 1)
                xi0 = jnp.clip(jnp.floor(x_f), 0, w_f - 1).astype(jnp.int32)
                yi0 = jnp.clip(jnp.floor(y_f), 0, h_f - 1).astype(jnp.int32)
                zi0 = jnp.clip(jnp.floor(z_f), 0, d_f - 1).astype(jnp.int32)
                sx = (w - 1) / (w_f - 1)
                sy = (h - 1) / (h_f - 1)
                sz = (d - 1) / (d_f - 1)
                bx0 = jnp.floor(xi0.astype(jnp.float32) * sx)
                by0 = jnp.floor(yi0.astype(jnp.float32) * sy)
                bz0 = jnp.floor(zi0.astype(jnp.float32) * sz)
                rows = jnp.take(
                    b27.reshape(d * h * w, -1),
                    (bz0.astype(jnp.int32) * h + by0.astype(jnp.int32)) * w
                    + bx0.astype(jnp.int32), axis=0)
                lrows = jnp.take(lse4.reshape(h_f * w_f, 4),
                                 yi0 * w_f + xi0, axis=0)
                return (rows.astype(jnp.float32).sum(-1) + lrows.sum(-1))
            t = chain_time(f, (cost, coord_img))
        elif s == 'atten_build_tables':
            def f(cost):
                return frustum.build_base27_tables(
                    cost, 4, pad_shape, dtype=jnp.bfloat16)
            t = chain_time(f, (cost,))
        elif s == 'stereo_gather':
            def f(vol, coord_img):
                return frustum.sample_stereo_volume_packed(
                    PS.pack_taps_3d(vol), vol.shape[-1], coord_img,
                    pad_shape, dmin, dmax)[0]
            t = chain_time(f, (vol, coord_img))
        elif s == 'stereo_gather_bf16':
            def f(vol, coord_img):
                return frustum.sample_stereo_volume_packed(
                    PS.pack_taps_3d(vol.astype(jnp.bfloat16)),
                    vol.shape[-1], coord_img, pad_shape, dmin, dmax)[0]
            t = chain_time(f, (vol, coord_img))
        elif s == 'sem_gather':
            sem = vol[0]  # (80, 320, 32) stand-in for sem features
            def f(sem, coord_img):
                u, v = coord_img[..., 0], coord_img[..., 1]
                valid2d = (u >= 0) & (u <= pad_shape[1]) & \
                          (v >= 0) & (v <= pad_shape[0])
                return frustum.sample_sem_features_packed(
                    PS.pack_taps_2d(sem), sem.shape[-1], coord_img,
                    pad_shape, valid2d)
            t = chain_time(f, (sem, coord_img))
        elif s == 'cost':
            from dfm_tpu.ops import cost_volume as CV
            cfg2, *_ = (cfg,)
            rng = np.random.RandomState(1)
            h_f, w_f = 320, 1280  # full-res stereo feats (SPP upconv out)
            cur_f = jnp.asarray(rng.randn(1, h_f, w_f, 32).astype(np.float32))
            prev_f = jnp.asarray(
                rng.randn(1, h_f, w_f, 32).astype(np.float32))
            depths = jnp.asarray(
                np.linspace(cfg.depth_min, cfg.depth_max,
                            cfg.num_downsampled_bins).astype(np.float32))
            cam = np.eye(4, dtype=np.float32)
            cam[0, 0] = cam[1, 1] = 721.5
            cam[0, 2], cam[1, 2] = 640, 160
            c2p = np.eye(4, dtype=np.float32)
            c2p[0, 3] = 0.3
            c2p[2, 3] = -0.8
            def f(cur_f, prev_f):
                return CV.build_plane_sweep_cost(
                    cur_f, prev_f, depths, jnp.asarray(cam)[None],
                    jnp.asarray(c2p)[None], cost_sample_factor=4,
                    feat_sample_factor=1)
            t = chain_time(f, (cur_f, prev_f))
        else:
            print(f'{s}: unknown stage', file=sys.stderr)
            continue
        print(f'{s}: {t * 1e3:.2f} ms')


if __name__ == '__main__':
    main()
