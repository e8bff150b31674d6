"""SMOKE DLA-34 KITTI 3-class.

Mirrors mmdet3d's smoke_dla34_pytorch_dlaneck_gn-all_8x4_6x_kitti-
mono3d.py hyperparameters (the SMOKE family the reference inherits;
dense_heads/smoke_mono3d_head.py).
"""

model = dict(
    type='SMOKEMono3D',
    num_classes=3,
    base_depth=(28.01, 16.32),
    base_dims=((0.88, 1.73, 0.67), (1.78, 1.70, 0.58),
               (3.88, 1.63, 1.53)),
    max_objs=100,
    topk=100,
    score_thr=0.25,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    input_size=(384, 1280),
    batch_size_per_chip=8,
)

optimizer = dict(lr=2.5e-4, weight_decay=0.0, grad_clip_norm=35.0)
schedule = dict(total_epochs=72, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
