"""DfM-R34 KITTI 3-class — flagship config (FULL training recipe).

Mirrors the reference's configs/dfm/dfm_r34_1x8_kitti-3d-3class.py:
the flagship trains `DfMFull` — the 3D anchor head PLUS the frozen
SECOND LiDAR teacher imitation (`lidar_model`, ref config :13-43),
the 2D ATSS auxiliary head (ref dfm.py:330-347) and the dense depth
loss, exactly like the reference's `DfM.forward_train` (:300-371).
Inference uses only the student path (dfm_predict), so eval/bench are
unchanged vs the bare-DfM configs.

The teacher starts from a converted LIGA-SECOND checkpoint
(`teacher_checkpoint`; produce it with
tools/model_converters/convert_second_checkpoints.py) and receives no
optimizer updates (runtime/train.py frozen_prefixes).
"""

model = dict(
    type='DfMFull',
    # 2D auxiliary ATSS head (reference bbox_head_2d, dfm.py:330-347)
    atss=dict(in_channels=32, feat_channels=64, stacked_convs=1),
    # converted SECOND teacher weights; trained from scratch if absent
    teacher_checkpoint='work_dirs/second_teacher/teacher.msgpack',
    depth_num_bins=288,
    depth_min=2.0,
    depth_max=59.6,
    depth_downsample=4,
    point_cloud_range=(2, -30.4, -3, 59.6, 30.4, 1),
    voxel_size=(0.2, 0.2, 0.2),
    cost_sample_factor=4,
    cv_channels=32,
    bev_channels=64,
    backbone_depth=34,
    normalizer_clamp_value=10.0,
    nms_pre=1024,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    crop_size=(320, 1280),
    scale_range=(0.95, 1.05),
    flip_ratio=0.5,
    num_ref_imgs=1,
    max_gt=32,
    batch_size_per_chip=1,
)

optimizer = dict(
    lr=1e-3,
    weight_decay=1e-4,
    grad_clip_norm=35.0,
    warmup_iters=464,
    warmup_ratio=0.1,
    decay_epochs=(50,),
    gamma=0.1,
)

schedule = dict(total_epochs=60, eval_interval=1, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=10)
