"""SECOND Waymo-D5 3-class with sync BN.

Mirrors configs/second/hv_second_secfpn_sbn_2x16_2x_waymoD5-3d-3class
.py hyperparameters. SyncBN is implicit on TPU: BatchNorm reductions
under pjit data parallelism are already global (models/layers.py).
"""

model = dict(
    type='VoxelNet',
    num_classes=3,
    point_cloud_range=(-76.8, -51.2, -2, 76.8, 51.2, 4),
    voxel_size=(0.32, 0.32, 0.6),
    max_points_per_voxel=10,
    cv_channels=32,
    bev_channels=64,
    anchor_ranges=(
        (-76.8, -51.2, -0.0345, 76.8, 51.2, -0.0345),
        (-76.8, -51.2, 0.0, 76.8, 51.2, 0.0),
        (-76.8, -51.2, -0.1188, 76.8, 51.2, -0.1188),
    ),
    anchor_sizes=((4.73, 2.08, 1.77), (0.91, 0.84, 1.74),
                  (1.81, 0.84, 1.77)),
    anchor_rotations=(0.0, 1.57),
    assigner_cfgs=(
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
    ),
    nms_pre=4096,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=500,
)

data = dict(
    type='WaymoDataset',
    data_root='data/waymo/kitti_format',
    load_interval=5,
    max_points=32000,
    batch_size_per_chip=2,
)

optimizer = dict(lr=1e-3, weight_decay=1e-2, grad_clip_norm=10.0)
schedule = dict(total_epochs=48, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=4, max_keep=5)
