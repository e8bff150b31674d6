"""Point containers + coordinate conversions (numpy).

Equivalent of the reference's `mmdet3d/core/points/` class family
(base_points.py:446 + cam/lidar/depth subclasses) and the subset of
`box_np_ops` conversions the pipelines use. Functional numpy instead
of tensor-backed classes: a point cloud is an (N, 3+C) array plus a
coordinate-frame tag; conversions are pure functions mirroring
`Coord3DMode.convert_point` (core/bbox/structures/coord_3d_mode.py:234).

Frames (reference conventions):
    CAM:   x right, y down, z forward
    LIDAR: x forward, y left, z up
    DEPTH: x right, y forward, z up
"""

import numpy as np

__all__ = ['Points', 'convert_points', 'cam2lidar', 'lidar2cam',
           'cam2depth', 'depth2cam', 'lidar2depth', 'depth2lidar',
           'points_in_range', 'rotate_points_z', 'flip_points']

# rotation part of Coord3DMode.convert_point (xyz -> xyz)
_R = {
    ('cam', 'lidar'): np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                               np.float32),
    ('lidar', 'cam'): np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                               np.float32),
    ('cam', 'depth'): np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]],
                               np.float32),
    ('depth', 'cam'): np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                               np.float32),
    ('lidar', 'depth'): np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                                 np.float32),
    ('depth', 'lidar'): np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]],
                                 np.float32),
}


class Points:
    """(N, 3+C) points with a frame tag; extra columns ride along."""

    def __init__(self, arr, frame='lidar'):
        assert frame in ('cam', 'lidar', 'depth'), frame
        self.arr = np.asarray(arr, np.float32)
        self.frame = frame

    @property
    def xyz(self):
        return self.arr[:, :3]

    def to(self, frame):
        if frame == self.frame:
            return self
        out = self.arr.copy()
        out[:, :3] = convert_points(self.xyz, self.frame, frame)
        return Points(out, frame)

    def in_range(self, pcr):
        return Points(self.arr[points_in_range(self.xyz, pcr)],
                      self.frame)

    def __len__(self):
        return len(self.arr)


def convert_points(xyz, src, dst):
    """Rotate xyz columns between coordinate frames."""
    if src == dst:
        return np.asarray(xyz, np.float32)
    return np.asarray(xyz, np.float32) @ _R[(src, dst)].T


def cam2lidar(xyz):
    return convert_points(xyz, 'cam', 'lidar')


def lidar2cam(xyz):
    return convert_points(xyz, 'lidar', 'cam')


def cam2depth(xyz):
    return convert_points(xyz, 'cam', 'depth')


def depth2cam(xyz):
    return convert_points(xyz, 'depth', 'cam')


def lidar2depth(xyz):
    return convert_points(xyz, 'lidar', 'depth')


def depth2lidar(xyz):
    return convert_points(xyz, 'depth', 'lidar')


def points_in_range(xyz, pcr):
    """Mask of points inside [x0,y0,z0,x1,y1,z1] (reference
    BasePoints.in_range_3d)."""
    pcr = np.asarray(pcr, np.float32)
    return ((xyz[:, 0] >= pcr[0]) & (xyz[:, 0] < pcr[3]) &
            (xyz[:, 1] >= pcr[1]) & (xyz[:, 1] < pcr[4]) &
            (xyz[:, 2] >= pcr[2]) & (xyz[:, 2] < pcr[5]))


def rotate_points_z(xyz, angle):
    """Rotate about the up axis (box_np_ops.rotation_points_single_angle
    axis=2)."""
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    out = np.asarray(xyz, np.float32).copy()
    out[:, :3] = out[:, :3] @ rot.T
    return out


def flip_points(xyz, axis='y', frame='lidar'):
    """Horizontal/vertical flip (BasePoints.flip semantics: lidar
    horizontal flips y, depth horizontal flips x)."""
    out = np.asarray(xyz, np.float32).copy()
    col = {'lidar': {'y': 1, 'x': 0},
           'depth': {'y': 1, 'x': 0},
           'cam': {'y': 0, 'x': 0}}[frame]['y' if axis == 'y' else 'x']
    out[:, col] = -out[:, col]
    return out
