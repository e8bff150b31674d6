"""SECOND LiDAR teacher for DfM feature imitation.

Mirrors configs/dfm/second_teacher.py: the frozen VoxelNet
(Voxelization -> VFE -> encoder -> BEV) whose volume/BEV features the
DfM student imitates. TPU path: dense scatter-mean voxelization +
dense 3D encoder at the imitation grid (models/detectors/teacher.py).
"""

model = dict(
    type='VoxelNet',
    point_cloud_range=(2, -30.4, -3, 59.6, 30.4, 1),
    voxel_size=(0.2, 0.2, 0.2),
    cv_channels=32,
    bev_channels=64,
    nms_pre=1024,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    max_points=18000,
    batch_size_per_chip=2,
)

optimizer = dict(lr=1e-3, weight_decay=1e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=80, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
