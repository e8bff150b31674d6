"""SSN (shape-aware grouping head) on Lyft, 9 classes.

The shape-signature-network recipe from upstream mmdet3d
(configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_lyft-3d.py; head at
mmdet3d/models/dense_heads/shape_aware_head.py — vendored by the
reference): classes are grouped by physical shape into 4 task
branches, small objects keep full BEV resolution while large vehicles
see a strided branch with more context. Training data goes through
CBGSDataset class-balanced resampling + 10-sweep point accumulation
(dfm_tpu/data/wrappers.py).

Class order follows dfm_tpu.data.lyft.LyftDataset.CLASSES; anchor
sizes are the Lyft per-class means used by the upstream recipe
(approximate where upstream and devkit disagree — stated here so the
numbers aren't mistaken for measured parity).
"""

_R = (0.0, 1.57)

model = dict(
    type='VoxelNet',
    bbox_head='shape_aware',
    num_classes=9,
    point_cloud_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    voxel_size=(0.4, 0.4, 8.0 / 20),
    max_points_per_voxel=5,
    cv_channels=32,
    bev_channels=64,
    # tasks list classes in class-index order:
    # car | truck/bus/emergency/other (large) | moto/bicycle | ped/animal
    tasks=(
        dict(num_class=1, num_base_anchors=1 * len(_R),
             shared_conv_channels=(64, 64),
             shared_conv_strides=(1, 1)),
        dict(num_class=4, num_base_anchors=4 * len(_R),
             shared_conv_channels=(64, 64, 64),
             shared_conv_strides=(2, 1, 1)),
        dict(num_class=2, num_base_anchors=2 * len(_R),
             shared_conv_channels=(64, 64),
             shared_conv_strides=(1, 1)),
        dict(num_class=2, num_base_anchors=2 * len(_R),
             shared_conv_channels=(64, 64),
             shared_conv_strides=(1, 1)),
    ),
    anchor_ranges=(
        (-51.2, -51.2, -1.1, 51.2, 51.2, -1.1),    # car
        (-51.2, -51.2, -0.3, 51.2, 51.2, -0.3),    # truck
        (-51.2, -51.2, 0.2, 51.2, 51.2, 0.2),      # bus
        (-51.2, -51.2, -0.2, 51.2, 51.2, -0.2),    # emergency_vehicle
        (-51.2, -51.2, -0.1, 51.2, 51.2, -0.1),    # other_vehicle
        (-51.2, -51.2, -1.3, 51.2, 51.2, -1.3),    # motorcycle
        (-51.2, -51.2, -1.1, 51.2, 51.2, -1.1),    # bicycle
        (-51.2, -51.2, -0.9, 51.2, 51.2, -0.9),    # pedestrian
        (-51.2, -51.2, -1.8, 51.2, 51.2, -1.8),    # animal
    ),
    anchor_sizes=(
        (4.75, 1.92, 1.71),     # car
        (10.24, 2.84, 3.44),    # truck
        (12.70, 2.92, 3.42),    # bus
        (6.52, 2.42, 2.34),     # emergency_vehicle
        (8.17, 2.75, 3.20),     # other_vehicle
        (2.35, 0.96, 1.59),     # motorcycle
        (1.76, 0.63, 1.44),     # bicycle
        (0.80, 0.76, 1.76),     # pedestrian
        (0.73, 0.35, 0.50),     # animal
    ),
    anchor_rotations=_R,
    assigner_cfgs=(
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
    ),
    nms_pre=1024,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='LyftDataset',
    data_root='data/lyft',
    max_points=32768,
    max_gt=64,
    sweeps_num=10,
    cbgs=True,
    batch_size_per_chip=2,
)

optimizer = dict(lr=1e-3, weight_decay=1e-2, grad_clip_norm=35.0,
                 warmup_iters=1000, warmup_ratio=0.1,
                 decay_epochs=(20, 23), gamma=0.1)

schedule = dict(total_epochs=24, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=5)
