"""SECOND (hard-voxelization) KITTI car-only.

Mirrors configs/second/hv_second_secfpn_6x8_80e_kitti-3d-car.py.
"""

_base_ = 'hv_second_kitti_3class.py'

model = dict(
    num_classes=1,
    anchor_ranges=((0, -40.0, -1.78, 70.4, 40.0, -1.78),),
    anchor_sizes=((3.9, 1.6, 1.56),),
    assigner_cfgs=(
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),),
)
