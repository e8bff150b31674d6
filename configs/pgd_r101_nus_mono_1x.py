"""PGD R101 nuScenes monocular, 1x schedule.

Mirrors configs/pgd/pgd_r101_caffe_fpn_gn-head_2x16_1x_nus-mono3d.py:
PGD depth classifier over the nuScenes range + attrs/velocity.
"""

model = dict(
    type='PGD',
    num_classes=10,
    backbone_depth=101,
    pred_attrs=True,
    num_attrs=9,
    pred_velo=True,
    use_depth_classifier=True,
    depth_range=(0.0, 50.0),
    depth_unit=10.0,
    depth_branch=(256,),
    weight_dim=1,
    uncertainty_alpha=1.0,
    pred_keypoints=False,
    pred_bbox2d=True,
    score_thr=0.01,
    nms_thr=0.25,
    max_num=200,
)

data = dict(
    type='NuScenesMonoDataset',
    data_root='data/nuscenes',
    input_size=(928, 1600),
    batch_size_per_chip=2,
)

optimizer = dict(lr=4e-3, weight_decay=1e-4, grad_clip_norm=35.0,
                 warmup_iters=500, warmup_ratio=0.33)
schedule = dict(total_epochs=12, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
