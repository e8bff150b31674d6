"""Separable frustum->voxel sampling (MXU formulation).

The DfM frustum lifting samples three tables at the projected voxel
centers (reference feature_transformation.py:100-160):

    stereo volume (D, H, W, C)    trilinear at (u, v, depth)
    fine softmax  (D_f, H_f, W_f) trilinear at (u, v, depth)
    sem features  (Hs, Ws, Cs)    bilinear  at (u, v)

For a KITTI-style projection matrix (P[0,1] = P[1,0] = P[2,0] =
P[2,1] = 0 — true for every rectified P2/P3, and preserved by the
scale/crop/flip augmentations) the projection of the pseudo-LiDAR
voxel grid is *separable per x-slab*:

    cam = (-y_l, -z_l, x_l)                 (pseudo-lidar -> rect cam)
    u(s, y) = (-P00 y_l + P02 x_s + P03) / (P22 x_s + P23)
    v(s, z) = (-P11 z_l + P12 x_s + P13) / (P22 x_s + P23)
    depth(s) = x_s                          (static per slab!)

so each voxel-x slab s samples its tables on an axis-aligned product
grid: interpolation = two small matmuls with 2-tap hat-weight matrices
instead of per-voxel gathers. TPU gathers are row-count bound (~6-17
ns/row); the matmul form runs on the MXU and is ~10x faster at DfM
shapes (48+35+11 ms of packed gathers -> ~8 ms of einsums).

The hat-weight form  M[q, j] = max(0, 1 - |idx(q) - j|)  reproduces the
masked-tap border semantics of `packed_sample` exactly (out-of-range
taps get zero weight), and the depth axis uses the *static* per-slab
bin coordinate, so the floor/frac/validity and the slab->depth-slice
grouping are computed in Python at trace time.

Used by FrustumToVoxel when `separable=True` (the DfM-KITTI path);
arbitrary projection matrices (e.g. multi-view Waymo lidar2img with
rotation) must keep the generic gather path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .resize import interp_matrix

__all__ = ['slab_uv', 'slab_depth_static', 'hat_matrix',
           'separable_stereo_sample', 'separable_sem_sample',
           'build_fine_softmax_volume', 'separable_softmax_attention',
           'is_separable_cam']

_HP = jax.lax.Precision.HIGHEST


def _mm(eq, a, b, fast):
    """Sampling einsum. `fast` (bf16 feature volumes): bf16 operands
    with f32 accumulation — hat weights round to bf16 (<=0.4% weight
    error, immaterial next to bf16 feature values; the gather path
    rounds the features identically). Exact f32/HIGHEST otherwise
    (parity tests, f32 models)."""
    if fast:
        return jnp.einsum(eq, a.astype(jnp.bfloat16),
                          b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(eq, a.astype(jnp.float32), b.astype(jnp.float32),
                      precision=_HP)


def is_separable_cam(cam2img, atol=0.0):
    """Host-side check (on a CONCRETE matrix) that the projection
    factorizes per x-slab. Use in tests / data validation, not under
    jit."""
    m = np.asarray(cam2img)
    return (abs(m[0, 1]) <= atol and abs(m[1, 0]) <= atol and
            abs(m[2, 0]) <= atol and abs(m[2, 1]) <= atol)


def slab_uv(cam2img, xs, ys, zs):
    """Per-slab image coordinates.

    Args:
        cam2img: (4, 4) augmented intrinsics (traced), KITTI P-form.
        xs: (nx,) slab depths (pseudo-lidar x = rect-cam z).
        ys: (ny,) pseudo-lidar y (rect-cam -x).
        zs: (nz,) pseudo-lidar z (rect-cam -y).

    Returns:
        u: (nx, ny), v: (nx, nz) pixel coordinates.
    """
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    zs = jnp.asarray(zs, jnp.float32)
    den = cam2img[2, 2] * xs + cam2img[2, 3]                   # (nx,)
    u = (-cam2img[0, 0] * ys[None, :] +
         (cam2img[0, 2] * xs + cam2img[0, 3])[:, None]) / den[:, None]
    v = (-cam2img[1, 1] * zs[None, :] +
         (cam2img[1, 2] * xs + cam2img[1, 3])[:, None]) / den[:, None]
    return u, v


def slab_depth_static(xs, depth_min, depth_max, num_bins):
    """Static per-slab depth-bin coordinate (f32 semantics of
    `_frustum_indices`): z_idx = (x - dmin)/(dmax - dmin) * (D - 1).

    Returns dict of np arrays: z0 (int), f (frac), w0/w1 (tap weights
    incl. border masking), all (nx,).
    """
    xs = np.asarray(xs, np.float32)
    rng = np.float32(depth_max) - np.float32(depth_min)
    z_norm = (xs - np.float32(depth_min)) / rng
    z_idx = z_norm * np.float32(num_bins - 1)
    z0 = np.floor(z_idx)
    f = z_idx - z0
    v0 = (z0 >= 0) & (z0 <= num_bins - 1)
    v1 = (z0 + 1 >= 0) & (z0 + 1 <= num_bins - 1)
    in_range = (z_norm >= 0) & (z_norm <= 1)
    return dict(
        z0=np.clip(z0, 0, num_bins - 1).astype(np.int32),
        z1=np.clip(z0 + 1, 0, num_bins - 1).astype(np.int32),
        w0=((1 - f) * v0).astype(np.float32),
        w1=(f * v1).astype(np.float32),
        in_range=in_range,
    )


def hat_matrix(idx, n, dtype=jnp.float32):
    """(..., m) fractional indices -> (..., m, n) 2-tap interpolation
    matrix: M[..., q, j] = max(0, 1 - |idx_q - j|). Equals bilinear
    weights with out-of-range taps masked (packed_sample semantics)."""
    nodes = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx[..., None] - nodes)
                       ).astype(dtype)


def _runs(vals):
    """Group a nondecreasing int array into (value, start, length) runs."""
    vals = np.asarray(vals)
    out = []
    s = 0
    for i in range(1, len(vals) + 1):
        if i == len(vals) or vals[i] != vals[s]:
            out.append((int(vals[s]), s, i - s))
            s = i
    return out


def _group_slabs(z0):
    """Static slab grouping by shared depth slice pair.

    Returns (slice_idx (K,), ord (K, R), mask (K, R), pos (nx,)):
    slabs ord[k] all read volume slices (slice_idx[k], slice_idx[k]+1);
    pos[s] = flat position of slab s in ord."""
    runs = _runs(z0)
    k = len(runs)
    r = max(n for _, _, n in runs)
    ord_ = np.zeros((k, r), np.int32)
    mask = np.zeros((k, r), bool)
    pos = np.zeros(len(z0), np.int32)
    slice_idx = np.zeros((k,), np.int32)
    for ki, (val, start, n) in enumerate(runs):
        slice_idx[ki] = val
        ord_[ki, :n] = np.arange(start, start + n)
        mask[ki, :n] = True
        pos[np.arange(start, start + n)] = ki * r + np.arange(n)
    return slice_idx, ord_, mask, pos


def separable_stereo_sample(vol, u, v, ds, pad_shape, out_f32=False):
    """Trilinear stereo-volume sampling as per-slab matmuls.

    Args:
        vol: (D, H, W, C) stereo feature volume.
        u: (nx, ny), v: (nx, nz) pixel coords from `slab_uv`.
        ds: static dict from `slab_depth_static` (num_bins = D).
        pad_shape: (pad_h, pad_w).

    Returns:
        out: (nz, ny, nx, C); valid2d: (nz, ny, nx) bool.
    """
    d, h, w, c = vol.shape
    nx, ny = u.shape
    nz = v.shape[1]
    pad_h, pad_w = pad_shape

    slice_idx, ord_, mask, pos = _group_slabs(ds['z0'])
    k, r = ord_.shape
    ordj = jnp.asarray(ord_)
    fast = vol.dtype == jnp.bfloat16
    mdtype = jnp.bfloat16 if fast else jnp.float32

    # hat matrices built directly in grouped order (and at matmul
    # width): avoids materializing the (nx, ny, w) f32 tensor twice
    x_idx = u / (pad_w - 1) * (w - 1)                       # (nx, ny)
    y_idx = v / (pad_h - 1) * (h - 1)                       # (nx, nz)
    mu_g = hat_matrix(x_idx[ordj], w, mdtype)               # (K, R, ny, w)
    mv_g = hat_matrix(y_idx[ordj], h, jnp.float32)          # (K, R, nz, h)
    w0 = jnp.asarray(ds['w0'])[ord_] * mask                 # (K, R)
    w1 = jnp.asarray(ds['w1'])[ord_] * mask

    v0 = vol[jnp.asarray(slice_idx)]                        # (K, h, w, c)
    v1 = vol[jnp.asarray(np.minimum(slice_idx + 1, d - 1))]

    # depth lerp folded into the v-hat weights; one concat einsum over
    # a 2h contraction (measured faster than two h-contractions)
    mv01 = jnp.concatenate(
        [mv_g * w0[..., None, None], mv_g * w1[..., None, None]],
        axis=-1).astype(mdtype)                             # (K,R,nz,2h)
    v01 = jnp.concatenate([v0, v1], axis=1)                 # (K, 2h, w, c)
    t = _mm('krzh,khwc->krzwc', mv01, v01, fast)
    out = _mm('krzwc,kryw->krzyc', t, mu_g, fast)
    # un-pad the grouped slabs back to nx order. Groups are contiguous
    # RUNS of the slab index, so this is a static slice+concat — a
    # gather here fuses into a >16 MB scoped-vmem allocation at
    # batch > 1 and fails to compile.
    runs = _runs(ds['z0'])
    out = jnp.concatenate([out[ki, :n] for ki, (_, _, n) in
                           enumerate(runs)], axis=0)   # (nx, nz, ny, c)
    out = out.transpose(1, 2, 0, 3)                         # (nz, ny, nx, c)

    valid2d = ((u >= 0) & (u <= pad_w))[None, :, :].transpose(0, 2, 1) & \
              ((v >= 0) & (v <= pad_h)).T[:, None, :]       # (nz, ny, nx)
    valid = valid2d & jnp.asarray(ds['in_range'])[None, None, :]
    out = out * valid[..., None]
    if not out_f32:
        out = out.astype(vol.dtype)
    return out, valid2d


def separable_sem_sample(sem, u, v, pad_shape, valid2d):
    """Bilinear sem-feature sampling as per-slab matmuls.

    Args:
        sem: (Hs, Ws, Cs); u: (nx, ny); v: (nx, nz); valid2d from
        `separable_stereo_sample` ((nz, ny, nx), reference semantics:
        depth coordinate ignored).

    Returns:
        (nz, ny, nx, Cs).
    """
    hs, ws, cs = sem.shape
    pad_h, pad_w = pad_shape
    fast = sem.dtype == jnp.bfloat16
    mdtype = jnp.bfloat16 if fast else jnp.float32
    x_idx = u / (pad_w - 1) * (ws - 1)
    y_idx = v / (pad_h - 1) * (hs - 1)
    mu = hat_matrix(x_idx, ws, mdtype)                      # (nx, ny, ws)
    mv = hat_matrix(y_idx, hs, mdtype)                      # (nx, nz, hs)
    t = _mm('szh,hwc->szwc', mv, sem, fast)
    out = _mm('szwc,syw->szyc', t, mu, fast)
    out = out.transpose(1, 2, 0, 3)                         # (nz, ny, nx, c)
    # cast BEFORE the mask multiply: the f32 einsum result otherwise
    # crosses the kernel-cond boundary as a 214 MB f32 materialization
    # (seen in the r3 xplane trace)
    return out.astype(sem.dtype) * valid2d[..., None].astype(sem.dtype)


def build_fine_softmax_volume(cost, up_factor, pad_shape,
                              dtype=jnp.bfloat16):
    """softmax_D(upsample x4(cost)) materialized on the fine grid:
    (D_f, H_f, W_f) in `dtype`.

    Equivalent of torch's trilinear-upsample -> softmax chain (reference
    feature_transformation.py:128-142). The softmax is internally
    consistent at any matmul precision (lse comes from the same fine
    array), so when the model runs bf16 the three interpolation matmuls
    use bf16 operands with f32 accumulation (6x cheaper than
    f32/HIGHEST); f32 inputs keep the exact path.
    """
    d, h, w = cost.shape
    h_f, w_f = pad_shape
    d_f = d * up_factor
    fast = cost.dtype == jnp.bfloat16
    wh = interp_matrix(h, h_f, dtype=jnp.float32)
    ww = interp_matrix(w, w_f, dtype=jnp.float32)
    wd = interp_matrix(d, d_f, dtype=jnp.float32)
    ch = _mm('ab,dbw->daw', wh, cost, fast)
    chw = _mm('cw,daw->dac', ww, ch, fast)
    fine = _mm('fd,dhw->fhw', wd, chw, fast)
    lse = jax.nn.logsumexp(fine, axis=0)
    return jnp.exp(fine - lse[None]).astype(dtype)


def separable_softmax_attention(sm_fine, u, v, dsf, pad_shape):
    """Sample the fine softmax volume trilinearly — per-slab matmuls.

    Args:
        sm_fine: (D_f, H_f, W_f) from `build_fine_softmax_volume`.
        u: (nx, ny), v: (nx, nz) pixel coords.
        dsf: static dict from `slab_depth_static(xs, dmin, dmax, D_f)`.
        pad_shape: (pad_h, pad_w).

    Returns:
        (nz, ny, nx) attention weights (f32), zero outside validity.
    """
    d_f, h_f, w_f = sm_fine.shape
    pad_h, pad_w = pad_shape
    x_f = u / (pad_w - 1) * (w_f - 1)                       # (nx, ny)
    y_f = v / (pad_h - 1) * (h_f - 1)                       # (nx, nz)
    mdtype = sm_fine.dtype if sm_fine.dtype == jnp.bfloat16 \
        else jnp.float32
    mu = hat_matrix(x_f, w_f, mdtype)                       # (nx, ny, w_f)
    mv = hat_matrix(y_f, h_f, mdtype)                       # (nx, nz, h_f)

    z0 = jnp.asarray(dsf['z0'])
    z1 = jnp.asarray(dsf['z1'])
    w0 = jnp.asarray(dsf['w0'])
    w1 = jnp.asarray(dsf['w1'])
    fast = sm_fine.dtype == jnp.bfloat16
    smf = sm_fine if fast else sm_fine.astype(jnp.float32)
    # depth-lerped fine slice per slab (2 row gathers + fma, fused)
    smq = (smf[z0] * w0[:, None, None].astype(smf.dtype) +
           smf[z1] * w1[:, None, None].astype(smf.dtype))
    t = _mm('szh,shw->szw', mv, smq, fast)
    att = _mm('szw,syw->szy', t, mu, fast)
    att = att.transpose(1, 2, 0)                            # (nz, ny, nx)

    valid2d = ((u >= 0) & (u <= pad_w))[None].transpose(0, 2, 1) & \
              ((v >= 0) & (v <= pad_h)).T[:, None, :]
    valid = valid2d & jnp.asarray(dsf['in_range'])[None, None, :]
    return att * valid
