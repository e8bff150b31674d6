"""DGCNN semantic segmentation on S3DIS (13-class).

Mirrors mmdet3d's dgcnn_32x4_cosine_100e_s3dis_seg-3d-13class
(configs/_base_/models/dgcnn.py): three edge convs (D-KNN then F-KNN),
FA to 1024, one 512 FP MLP, LeakyReLU(0.2).
"""

model = dict(
    type='EncoderDecoder3D',
    backbone='DGCNNBackbone',
    head='DGCNNHead',
    num_classes=13,
    ignore_index=13,
    dg_num_samples=(20, 20, 20),
    dg_knn_modes=('D-KNN', 'F-KNN', 'F-KNN'),
    dg_gf_channels=((64, 64), (64, 64), (64,)),
    dg_fa_channels=(1024,),
    dg_fp_channels=(512,),
    channels=256,
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
    batch_size_per_chip=32,
)

optimizer = dict(lr=1e-3, weight_decay=1e-4, grad_clip_norm=10.0)
schedule = dict(total_epochs=100, eval_interval=10, log_interval=50,
                lr_schedule='cosine')
checkpoint = dict(interval_epochs=10, max_keep=3)
