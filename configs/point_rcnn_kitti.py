"""PointRCNN KITTI 3-class two-stage point detector.

Mirrors mmdet3d's point_rcnn_2x8_kitti-3d-3classes.py hyperparameters
(configs/_base_/models/point_rcnn.py: PointNet2SAMSG backbone +
PointNetFPNeck + PointRPNHead + PointRCNNRoIHead).
"""

model = dict(
    type='PointRCNN',
    num_classes=3,
    point_cloud_range=(0, -40, -3, 70.4, 40, 1),
    mean_sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)),
    num_proposals=128,
    roi_num_points=512,
    score_thr=0.1,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    max_points=16384,
    batch_size_per_chip=2,
)

optimizer = dict(lr=2e-3, weight_decay=1e-2, grad_clip_norm=10.0)
schedule = dict(total_epochs=80, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
