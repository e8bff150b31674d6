"""PAConv-style head segmentation on S3DIS (13-class).

Mirrors mmdet3d's paconv_ssg_8x8_cosine_150e_s3dis_seg-3d-13class head
topology (configs/_base_/models/paconv_ssg.py decode_head: the
PointNet++ decoder with the raw-feature skip at the finest level and a
bias-free pre-seg conv, models/decode_heads/paconv_head.py:9-63). The
encoder here is the standard PointNet2SASSG (the reference's PAConv
weight-bank SA convolution is tracked separately).
"""

model = dict(
    type='EncoderDecoder3D',
    backbone='PointNet2SASSG',
    head='PAConvHead',
    num_classes=13,
    ignore_index=13,
    sa_points=(1024, 256, 64, 16),
    # the reference PAConv encoder groups by kNN; the SSG ball-query
    # radii below are the closest static-shape equivalent
    sa_radii=(0.1, 0.2, 0.4, 0.8),
    sa_ks=(32, 32, 32, 32),
    sa_mlps=((32, 32, 64), (64, 64, 128), (128, 128, 256),
             (256, 256, 512)),
    # MLP widths per FP step (inputs are inferred; reference channel
    # lists (768,256,256)... include the input width as element 0)
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
    batch_size_per_chip=8,
)

optimizer = dict(lr=1e-3, weight_decay=1e-4, grad_clip_norm=10.0)
schedule = dict(total_epochs=150, eval_interval=10, log_interval=50,
                lr_schedule='cosine')
checkpoint = dict(interval_epochs=10, max_keep=3)
