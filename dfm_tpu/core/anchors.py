"""3D anchor generation (host-side numpy; anchors are compile-time
constants baked into the jitted step).

Mirrors the semantics of the reference's `Anchor3DRangeGenerator` /
`AlignedAnchor3DRangeGenerator` (mmdet3d/core/anchor/anchor_3d_generator.py)
but is a plain function producing a fixed array — anchors never change at
runtime, so on TPU they should be constants folded into the program, not
regenerated per step on device.
"""

import numpy as np

__all__ = ['Anchor3DRangeGenerator', 'AlignedAnchor3DRangeGenerator']


class Anchor3DRangeGenerator:
    """Generates anchors on a BEV grid by linspace over ranges.

    Args:
        ranges: list of [xmin, ymin, zmin, xmax, ymax, zmax] per size.
        sizes: list of [dx, dy, dz] anchor sizes.
        rotations: anchor yaw angles.

    Output layout matches the reference (anchor_3d_generator.py:155-224):
    (1, Ny, Nx, num_sizes, num_rots, 7).
    """

    def __init__(self,
                 ranges,
                 sizes=((3.9, 1.6, 1.56),),
                 rotations=(0.0, 1.5707963),
                 custom_values=(),
                 size_per_range=True):
        if size_per_range and len(ranges) == 1:
            ranges = list(ranges) * len(sizes)
        assert len(ranges) == len(sizes) or not size_per_range
        self.ranges = [list(r) for r in ranges]
        self.sizes = [list(s) for s in sizes]
        self.rotations = list(rotations)
        self.custom_values = list(custom_values)
        self.size_per_range = size_per_range

    @property
    def num_base_anchors(self):
        return len(self.sizes) * len(self.rotations)

    def _centers(self, lo, hi, num):
        """Per-axis anchor center positions (linspace endpoint-inclusive)."""
        return np.linspace(lo, hi, num, dtype=np.float32)

    def anchors_single_range(self, feature_size, anchor_range, size):
        """(Nz, Ny, Nx, 1, num_rot, 7) anchors for one size/range."""
        if len(feature_size) == 2:
            feature_size = [1, feature_size[0], feature_size[1]]
        nz, ny, nx = feature_size
        z = self._centers(anchor_range[2], anchor_range[5], nz)
        y = self._centers(anchor_range[1], anchor_range[4], ny)
        x = self._centers(anchor_range[0], anchor_range[3], nx)
        rot = np.asarray(self.rotations, dtype=np.float32)
        # grids indexed (z, y, x, rot)
        zz, yy, xx, rr = np.meshgrid(z, y, x, rot, indexing='ij')
        centers = np.stack([xx, yy, zz], axis=-1)  # (nz, ny, nx, nr, 3)
        sizes = np.broadcast_to(
            np.asarray(size, np.float32), centers.shape[:-1] + (3,))
        anchors = np.concatenate(
            [centers, sizes, rr[..., None]], axis=-1)  # (nz,ny,nx,nr,7)
        anchors = anchors[:, :, :, None, :, :]  # size axis
        if self.custom_values:
            extra = np.zeros(anchors.shape[:-1] + (len(self.custom_values),),
                             np.float32)
            anchors = np.concatenate([anchors, extra], axis=-1)
        return anchors

    def grid_anchors(self, featmap_size):
        """All anchors for one feature level.

        Returns:
            (1, Ny, Nx, num_sizes, num_rots, box_dim) float32 array
            (z collapsed — DfM/SECOND-style heads use a single z per class).
        """
        per_size = [
            self.anchors_single_range(featmap_size, r, s)
            for r, s in zip(self.ranges, self.sizes)
        ]
        return np.concatenate(per_size, axis=-3)  # concat on size axis

    def flat_anchors(self, featmap_size):
        """(Ny*Nx*num_sizes*num_rots, box_dim) anchors, row-major over
        (y, x, size, rot) — the same flattening order as the reference's
        permuted head outputs."""
        a = self.grid_anchors(featmap_size)
        return a.reshape(-1, a.shape[-1])


class AlignedAnchor3DRangeGenerator(Anchor3DRangeGenerator):
    """Anchor centers aligned to voxel centers (shifted half a voxel),
    matching the reference's AlignedAnchor3DRangeGenerator
    (anchor_3d_generator.py:225+). Also used to generate MultiViewDfM's
    3D sampling grid."""

    def anchors_single_range(self, feature_size, anchor_range, size):
        if len(feature_size) == 2:
            feature_size = [1, feature_size[0], feature_size[1]]
        nz, ny, nx = feature_size
        ar = np.asarray(anchor_range, np.float32)
        vz = (ar[5] - ar[2]) / nz
        vy = (ar[4] - ar[1]) / ny
        vx = (ar[3] - ar[0]) / nx
        z = np.linspace(ar[2] + vz / 2, ar[5] - vz / 2, nz, dtype=np.float32)
        y = np.linspace(ar[1] + vy / 2, ar[4] - vy / 2, ny, dtype=np.float32)
        x = np.linspace(ar[0] + vx / 2, ar[3] - vx / 2, nx, dtype=np.float32)
        rot = np.asarray(self.rotations, dtype=np.float32)
        zz, yy, xx, rr = np.meshgrid(z, y, x, rot, indexing='ij')
        centers = np.stack([xx, yy, zz], axis=-1)
        sizes = np.broadcast_to(
            np.asarray(size, np.float32), centers.shape[:-1] + (3,))
        anchors = np.concatenate([centers, sizes, rr[..., None]], axis=-1)
        anchors = anchors[:, :, :, None, :, :]
        if self.custom_values:
            extra = np.zeros(anchors.shape[:-1] + (len(self.custom_values),),
                             np.float32)
            anchors = np.concatenate([anchors, extra], axis=-1)
        return anchors
