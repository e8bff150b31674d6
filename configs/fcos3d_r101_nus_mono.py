"""FCOS3D R101-DCN nuScenes monocular (10-class, attrs + velocity).

Mirrors configs/fcos3d/fcos3d_r101_caffe_fpn_gn-head_dcn_2x8_1x_nus-
mono3d.py: attribute branch (9 attrs) and velocity regression enabled
(heads/fcos_mono3d.py pred_attrs / pred_velo).
"""

model = dict(
    type='FCOSMono3D',
    num_classes=10,
    backbone_depth=101,
    pred_attrs=True,
    num_attrs=9,
    pred_velo=True,
    score_thr=0.05,
    nms_thr=0.25,
    max_num=200,
)

data = dict(
    type='NuScenesMonoDataset',
    data_root='data/nuscenes',
    input_size=(928, 1600),
    batch_size_per_chip=2,
)

optimizer = dict(lr=2e-3, weight_decay=1e-4, grad_clip_norm=35.0,
                 warmup_iters=500, warmup_ratio=0.33)
schedule = dict(total_epochs=12, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
