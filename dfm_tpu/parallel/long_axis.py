"""Depth-axis model parallelism for plane-sweep volumes.

SURVEY §5 "long-axis memory strategy": the reference manages the 288-bin
cost volume with crude downsampling (cost_sample_factor, AvgPool-z); the
TPU-native capability is SHARDING the depth axis itself across the mesh,
so a volume that does not fit one chip's HBM trains across chips with
only nearest-neighbor ICI traffic:

* `depth_sharded_conv_gn` — a 3x3x3 ConvNorm whose input/output are
  sharded on D. Each shard `ppermute`s its boundary z-slice to its
  neighbors (1-slice halo, the conv's receptive field), convolves
  locally with 'valid' z-padding, and finishes GroupNorm with a `psum`
  of the per-shard moments — bit-equal (up to f32 reduction order) to
  the dense ConvNorm on the gathered volume.
* `depth_shard_spec` / `pad_depth_for_mesh` — helpers to lay a
  (B, D, H, W, C) volume out over a ('depth',) mesh axis.

This composes with data parallelism (a 2D ('data', 'depth') mesh: batch
on 'data', volume depth on 'depth'); the halos ride ICI ring permutes,
never DCN. Equivalent capability slot in the reference: none (it is
single-GPU per volume; see SURVEY §5).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:                       # JAX >= 0.4.35 moved shard_map to jax.*
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:        # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

__all__ = ['depth_shard_spec', 'pad_depth_for_mesh',
           'depth_sharded_conv_gn', 'halo_exchange_z']

DEPTH_AXIS = 'depth'


def depth_shard_spec(mesh: Mesh, axis: str = DEPTH_AXIS):
    """NamedSharding placing axis 1 (D) of a (B, D, H, W, C) volume on
    the mesh's depth axis."""
    return NamedSharding(mesh, P(None, axis, None, None, None))


def pad_depth_for_mesh(x, n_shards: int):
    """Zero-pad D up to a multiple of the shard count (zero slices are
    exact for conv + masked-GN pipelines that track the true D)."""
    d = x.shape[1]
    pad = (-d) % n_shards
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x, d


def halo_exchange_z(xl, axis: str = DEPTH_AXIS):
    """Exchange 1-slice z halos between depth-shard neighbors.

    xl: local (B, Dl, H, W, C). Returns (B, Dl+2, H, W, C) where the
    first/last slices come from the previous/next shard (zeros at the
    global volume boundary — conv 'same' semantics).
    """
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    if n == 1:
        z = jnp.zeros_like(xl[:, :1])
        return jnp.concatenate([z, xl, z], axis=1)
    fwd = [(j, (j + 1) % n) for j in range(n)]
    bwd = [(j, (j - 1) % n) for j in range(n)]
    from_prev = jax.lax.ppermute(xl[:, -1:], axis, fwd)
    from_next = jax.lax.ppermute(xl[:, :1], axis, bwd)
    from_prev = jnp.where(i == 0, 0.0, from_prev)
    from_next = jnp.where(i == n - 1, 0.0, from_next)
    return jnp.concatenate([from_prev, xl, from_next], axis=1)


def depth_sharded_conv_gn(x, kernel, scale, bias, num_groups,
                          mesh: Mesh, axis: str = DEPTH_AXIS,
                          eps: float = 1e-5, relu: bool = True):
    """3x3x3 'same' Conv3D + GroupNorm (+ReLU) with D sharded on `axis`.

    Args:
        x: (B, D, H, W, C) with D % mesh.shape[axis] == 0 (see
            `pad_depth_for_mesh`); any sharding (re-laid out here).
        kernel: (3, 3, 3, C, C_out); scale/bias: (C_out,) GN params.

    Returns:
        (B, D, H, W, C_out) sharded on D. Matches the dense
        ConvNorm(GN) to f32 accumulation order.
    """
    n = mesh.shape[axis]
    assert x.shape[1] % n == 0, (x.shape, n)
    c_out = kernel.shape[-1]
    g = num_groups if (c_out % num_groups == 0 and c_out >= num_groups) \
        else c_out

    def local_fn(xl, w, sc, bi):
        xh = halo_exchange_z(xl, axis)           # (B, Dl+2, H, W, C)
        y = jax.lax.conv_general_dilated(
            xh.astype(w.dtype), w,
            window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),    # valid-z (halo), same-hw
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=jnp.float32)  # (B, Dl, H, W, C_out)
        # GroupNorm over the GLOBAL volume: psum the per-shard moments
        b = y.shape[0]
        yy = y.reshape(b, -1, g, c_out // g)
        s = jax.lax.psum(yy.sum(axis=(1, 3)), axis)
        s2 = jax.lax.psum((yy * yy).sum(axis=(1, 3)), axis)
        cnt = jax.lax.psum(
            jnp.full((), yy.shape[1] * yy.shape[3], jnp.float32), axis)
        mean = s / cnt
        var = s2 / cnt - mean * mean
        rstd = jax.lax.rsqrt(var + eps)                     # (B, g)
        scg = sc.reshape(g, c_out // g)
        big = bi.reshape(g, c_out // g)
        sc_f = (scg[None] * rstd[..., None]).reshape(b, 1, 1, 1, c_out)
        bi_f = (big[None] - mean[..., None] * scg[None] *
                rstd[..., None]).reshape(b, 1, 1, 1, c_out)
        out = y * sc_f + bi_f
        if relu:
            out = jnp.maximum(out, 0.0)
        return out.astype(xl.dtype)

    spec = P(None, axis, None, None, None)
    return shard_map(
        local_fn, mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=spec)(x, kernel, scale.astype(jnp.float32),
                        bias.astype(jnp.float32))
