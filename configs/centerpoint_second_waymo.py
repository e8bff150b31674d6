"""CenterPoint (SECOND trunk) Waymo 3-class.

CenterPoint detector over the SECOND/SECONDFPN BEV trunk with the
CenterHead (models/detectors/centerpoint.py) — the reference registers
CenterPoint in its inherited detector zoo (mmdet3d detectors/
centerpoint.py) and MultiViewDfM's CenterHead branch shares the head.
"""

model = dict(
    type='CenterPoint',
    point_cloud_range=(-76.8, -51.2, -2.0, 76.8, 51.2, 4.0),
    voxel_size=(0.32, 0.32, 0.6),
    max_points_per_voxel=20,
    encoder_channels=64,
    second_channels=(128, 256),
    second_layers=(5, 5),
    second_strides=(1, 2),
    fpn_channels=(256, 256),
    fpn_strides=(1, 2),
    head=dict(
        tasks=(('Car',), ('Pedestrian', 'Cyclist')),
        voxel_size=(0.32, 0.32),
        pc_range=(-76.8, -51.2),
        out_size_factor=1,
        max_per_task=100,
        score_thr=0.1,
        circle_nms_thr=4.0,
    ),
    task_class_ids=((0,), (1, 2)),
)

data = dict(
    type='WaymoDataset',
    data_root='data/waymo/kitti_format',
    max_points=32000,
    batch_size_per_chip=2,
)

optimizer = dict(lr=1e-3, weight_decay=1e-2, grad_clip_norm=10.0)
schedule = dict(total_epochs=36, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=4, max_keep=5)
