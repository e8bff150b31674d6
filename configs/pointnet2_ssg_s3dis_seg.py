"""PointNet++ (SSG) semantic segmentation on S3DIS (13-class).

Mirrors mmdet3d's pointnet2_ssg_16x2_cosine_50e_s3dis_seg-3d-13class
(configs/_base_/models/pointnet2_ssg.py +
configs/_base_/datasets/s3dis_seg-3d-13class.py): train on areas
1/2/3/4/6, test on area 5, 4096-point patches of 1 m blocks with
normalized-coordinate extra features.
"""

model = dict(
    type='EncoderDecoder3D',
    backbone='PointNet2SASSG',
    head='PointNet2Head',
    num_classes=13,
    ignore_index=13,
    sa_points=(1024, 256, 64, 16),
    sa_radii=(0.1, 0.2, 0.4, 0.8),
    sa_ks=(32, 32, 32, 32),
    sa_mlps=((32, 32, 64), (64, 64, 128), (128, 128, 256),
             (256, 256, 512)),
    fp_channels=((256, 256), (256, 256), (256, 128), (128, 128, 128)),
    channels=128,
    dropout_ratio=0.5,
    num_points=4096,
    block_size=1.0,
    use_normalized_coord=True,
)

data = dict(
    type='S3DISSegDataset',
    data_root='data/s3dis',
    train_areas=(1, 2, 3, 4, 6),
    test_area=5,
    num_points=4096,
    batch_size_per_chip=16,
)

optimizer = dict(lr=1e-3, weight_decay=1e-3, grad_clip_norm=10.0)
schedule = dict(total_epochs=50, eval_interval=5, log_interval=50,
                lr_schedule='cosine')
checkpoint = dict(interval_epochs=5, max_keep=3)
