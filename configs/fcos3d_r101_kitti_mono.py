"""FCOS3D R101 monocular 3D detection (KITTI-style mono).

Mirrors the reference fcos3d config family hyperparameters.
"""

model = dict(
    type='FCOSMono3D',
    backbone_depth=101,
    num_classes=3,
    in_channels=256,
    feat_channels=256,
    stacked_convs=2,
    strides=(8, 16, 32, 64, 128),
    center_sample_radius=1.5,
    centerness_alpha=2.5,
    dir_offset=0.7854,
    nms_pre=1000,
    score_thr=0.05,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='KittiMono',
    data_root='data/kitti',
    img_hw=(384, 1280),
    max_gt=32,
    batch_size_per_chip=2,
)

optimizer = dict(lr=2e-3, weight_decay=1e-4, grad_clip_norm=35.0,
                 warmup_iters=500, warmup_ratio=0.33,
                 decay_epochs=(8, 11), gamma=0.1)
schedule = dict(total_epochs=12, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=5)
