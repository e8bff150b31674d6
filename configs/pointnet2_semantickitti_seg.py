"""PointNet++ (SSG) semantic segmentation on SemanticKITTI (20-class).

Dataset semantics follow the reference's `SemanticKITTIDataset`
(mmdet3d/datasets/semantickitti_dataset.py:9-110): velodyne scans
(x, y, z, intensity) + lower-16-bit .label semantics; class 0
('unlabeled') is the ignored label. The reference ships the dataset
without a model config; this pairs it with the PointNet2 seg stack.
"""

model = dict(
    type='EncoderDecoder3D',
    backbone='PointNet2SASSG',
    head='PointNet2Head',
    num_classes=20,
    ignore_index=0,
    sa_points=(1024, 256, 64, 16),
    sa_radii=(0.5, 1.0, 2.0, 4.0),       # outdoor LiDAR scale
    sa_ks=(32, 32, 32, 32),
    sa_mlps=((32, 32, 64), (64, 64, 128), (128, 128, 256),
             (256, 256, 512)),
    fp_channels=((256, 256), (256, 256), (256, 128), (128, 128, 128)),
    channels=128,
    dropout_ratio=0.5,
    num_points=8192,
    block_size=50.0,
    use_normalized_coord=False,
)

data = dict(
    type='SemanticKITTISegDataset',
    data_root='data/semantickitti',
    num_points=8192,
    batch_size_per_chip=8,
)

optimizer = dict(lr=1e-3, weight_decay=1e-3, grad_clip_norm=10.0)
schedule = dict(total_epochs=50, eval_interval=5, log_interval=50,
                lr_schedule='cosine')
checkpoint = dict(interval_epochs=5, max_keep=3)
