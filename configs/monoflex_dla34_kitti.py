"""MonoFlex DLA-34 KITTI 3-class.

Mirrors mmdet3d's monoflex_dla34_pytorch_dlaneck_gn-all_2x4_6x_kitti-
mono3d.py hyperparameters (the MonoFlex family the reference inherits;
dense_heads/monoflex_head.py): multibin orientation, keypoint-depth
ensemble with uncertainty fusion.
"""

model = dict(
    type='MonoFlex',
    num_classes=3,
    base_dims=((3.88, 1.53, 1.63), (0.84, 1.76, 0.66),
               (1.76, 1.73, 0.60)),
    max_objs=32,
    topk=100,
    score_thr=0.25,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    input_size=(384, 1280),
    batch_size_per_chip=4,
)

optimizer = dict(lr=3e-4, weight_decay=1e-5, grad_clip_norm=35.0)
schedule = dict(total_epochs=72, eval_interval=2, log_interval=50)
checkpoint = dict(interval_epochs=2, max_keep=5)
