"""MV-FCOS3D++ R101 multi-view on Waymo (camsync).

Mirrors configs/dfm/multiview-dfm_r101_dcn_2x16_waymoD5-3d-3class_camsync
hyperparameters (DCN substituted by standard convs this round).
"""

model = dict(
    type='MultiViewDfM',
    num_views=5,
    num_frames=1,
    feat_channels=64,
    voxel_range=(-35.0, -75.0, -2, 75.0, 75.0, 4),
    voxel_grid=(12, 240, 300),
    backbone_depth=101,
    nms_pre=1024,          # slow-infer variant: 4096 / max_num 500
    score_thr=0.1,
    nms_thr=0.25,
    max_num=500,
)

data = dict(
    type='WaymoDataset',
    data_root='data/waymo/kitti_format',
    num_frames=1,
    target_hw=(640, 960),
    num_views=5,
    max_gt=64,
    batch_size_per_chip=2,
)

optimizer = dict(lr=5e-4, weight_decay=1e-4, grad_clip_norm=35.0,
                 warmup_iters=500, warmup_ratio=0.33,
                 decay_epochs=(16, 22), gamma=0.1)
schedule = dict(total_epochs=24, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=5)
