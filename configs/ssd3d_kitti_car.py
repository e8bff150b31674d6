"""3DSSD on KITTI Car (single class, point-based single-stage).

Mirrors the reference's configs/3dssd/3dssd_4x4_kitti-3d-car.py +
configs/_base_/models/3dssd.py hyperparameters (SSD3DNet detector,
PointNet2SAMSG fusion-sampling backbone, SSD3DHead with centerness
objectness + corner loss).
"""

model = dict(
    type='SSD3DNet',
    num_classes=1,
    num_dir_bins=12,
    num_candidates=256,
    vote_xyz_range=(3.0, 3.0, 2.0),
    pos_distance_thr=10.0,
    expand_dims_length=0.05,
    point_cloud_range=(0, -40, -5, 70, 40, 3),
    score_thr=0.05,
    nms_thr=0.1,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    num_points=16384,
    classes=('Car',),
    batch_size_per_chip=4,
)

optimizer = dict(lr=2e-3, weight_decay=0.0, grad_clip_norm=35.0,
                 decay_epochs=(45, 60), gamma=0.1)
schedule = dict(total_epochs=80, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=10)
