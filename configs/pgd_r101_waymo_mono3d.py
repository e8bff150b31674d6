"""PGD R101-DCN Waymo-D3 monocular 3-class.

Mirrors configs/pgd/pgd_r101_fpn_gn-head_dcn_3x16_2x_waymoD3-mono3d.py
(per-camera monocular PGD; no attribute head on Waymo).
"""

model = dict(
    type='PGD',
    num_classes=3,
    backbone_depth=101,
    use_depth_classifier=True,
    depth_range=(0.0, 85.0),
    depth_unit=10.0,
    depth_branch=(64,),
    weight_dim=1,
    uncertainty_alpha=1.0,
    pred_keypoints=True,
    pred_bbox2d=True,
)

data = dict(
    type='WaymoDataset',
    data_root='data/waymo/kitti_format',
    load_mode='cam_mono',
    load_interval=3,
    input_size=(1280, 1920),
    batch_size_per_chip=2,
)

optimizer = dict(lr=8e-3, weight_decay=1e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=24, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
