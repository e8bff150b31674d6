"""Result visualization: meshlab .obj dumps + image overlays.

Equivalent of the reference's `mmdet3d/core/visualizer/show_result.py`
(points/boxes -> .obj files viewable in MeshLab; 291 LoC) and the
image-projection overlay helpers (image_vis.py). The interactive
open3d viewer is intentionally out of scope on a headless TPU host —
the .obj route is the reference's own headless path
(`show_result(..., snapshot=True)` analog).
"""

import os

import numpy as np

from ..core.box_np_ops import boxes3d_to_corners2d_image, corners_3d

__all__ = ['write_obj', 'write_oriented_bbox', 'show_result_meshlab',
           'draw_boxes_on_image']

_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
          (4, 5), (5, 7), (7, 6), (6, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def write_obj(points, out_path):
    """Dump an (N, 3[+3]) point cloud as .obj vertices (reference
    _write_obj)."""
    points = np.asarray(points)
    with open(out_path, 'w') as f:
        for p in points:
            if p.shape[-1] >= 6:
                f.write(f'v {p[0]} {p[1]} {p[2]} '
                        f'{p[3]} {p[4]} {p[5]}\n')
            else:
                f.write(f'v {p[0]} {p[1]} {p[2]}\n')


def write_oriented_bbox(boxes, out_path):
    """Dump (N, 7) boxes as wireframe line segments in .obj (reference
    _write_oriented_bbox writes ply; obj lines view identically in
    MeshLab)."""
    boxes = np.asarray(boxes, np.float32)
    corners = corners_3d(boxes)           # (N, 8, 3)
    with open(out_path, 'w') as f:
        for c in corners:
            for v in c:
                f.write(f'v {v[0]} {v[1]} {v[2]}\n')
        for i in range(len(corners)):
            base = i * 8
            for a, b in _EDGES:
                f.write(f'l {base + a + 1} {base + b + 1}\n')


def show_result_meshlab(points, gt_boxes, pred_boxes, out_dir,
                        filename='sample'):
    """Write <name>_points.obj / _gt.obj / _pred.obj (reference
    show_result file layout)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    if points is not None:
        paths['points'] = os.path.join(out_dir, f'{filename}_points.obj')
        write_obj(points, paths['points'])
    if gt_boxes is not None and len(gt_boxes):
        paths['gt'] = os.path.join(out_dir, f'{filename}_gt.obj')
        write_oriented_bbox(gt_boxes, paths['gt'])
    if pred_boxes is not None and len(pred_boxes):
        paths['pred'] = os.path.join(out_dir, f'{filename}_pred.obj')
        write_oriented_bbox(pred_boxes, paths['pred'])
    return paths


def draw_boxes_on_image(img, boxes_cam, cam2img, color=(0, 255, 0),
                        thickness=1):
    """Draw projected 3D wireframes on an image (reference
    draw_camera_bbox3d_on_img). Returns a copy."""
    import cv2
    img = np.ascontiguousarray(np.asarray(img).copy())
    if len(boxes_cam) == 0:
        return img
    pts = boxes3d_to_corners2d_image(boxes_cam, cam2img)
    # corner order from boxes3d_to_corners2d_image: x±, y{0,-h}, z±
    edges = [(0, 1), (2, 3), (4, 5), (6, 7),
             (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for box in pts.astype(np.int32):
        for a, b in edges:
            cv2.line(img, tuple(box[a]), tuple(box[b]), color, thickness)
    return img
