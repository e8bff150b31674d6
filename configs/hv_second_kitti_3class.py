"""SECOND (hard-voxelization) KITTI 3-class.

Mirrors configs/second/hv_second_secfpn_6x8_80e_kitti-3d-3class.py
hyperparameters (pc range [0,-40,-3,70.4,40,1], per-class anchors).
The reference's 0.05 m spconv SparseEncoder is replaced by the dense
scatter-mean + 3D conv encoder (models/detectors/voxelnet.py
docstring); anchor/assigner/NMS settings match.
"""

model = dict(
    type='VoxelNet',
    num_classes=3,
    point_cloud_range=(0, -40, -3, 70.4, 40, 1),
    voxel_size=(0.2, 0.2, 0.2),
    max_points_per_voxel=5,
    cv_channels=32,
    bev_channels=64,
    anchor_ranges=(
        (0, -40.0, -0.6, 70.4, 40.0, -0.6),
        (0, -40.0, -0.6, 70.4, 40.0, -0.6),
        (0, -40.0, -1.78, 70.4, 40.0, -1.78),
    ),
    anchor_sizes=((0.8, 0.6, 1.73), (1.76, 0.6, 1.73), (3.9, 1.6, 1.56)),
    anchor_rotations=(0.0, 1.57),
    assigner_cfgs=(
        dict(pos_iou_thr=0.35, neg_iou_thr=0.2, min_pos_iou=0.2),
        dict(pos_iou_thr=0.35, neg_iou_thr=0.2, min_pos_iou=0.2),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
    ),
    nms_pre=1024,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    max_points=18000,
    batch_size_per_chip=6,
)

optimizer = dict(lr=2e-3, weight_decay=1e-2, grad_clip_norm=10.0,
                 warmup_iters=1000)
schedule = dict(total_epochs=80, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
