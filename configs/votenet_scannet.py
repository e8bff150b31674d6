"""VoteNet on ScanNet V2 (18-class indoor).

Mirrors mmdet3d's votenet_8x8_scannet-3d-18class.py hyperparameters
(the VoteNet family the reference inherits; detectors/votenet.py +
dense_heads/vote_head.py; dataset pipeline from
configs/_base_/datasets/scannet-3d-18class.py).
"""

model = dict(
    type='VoteNet',
    num_classes=18,
    num_heading_bins=1,       # ScanNet boxes are yaw-free
    num_proposals=256,
    vote_radius=0.3,
    vote_k=16,
    mean_sizes=(
        (0.76966727, 0.8116021, 0.92573744),
        (1.876858, 1.8425595, 1.1931566),
        (0.61328, 0.6148609, 0.7182701),
        (1.3955007, 1.5121545, 0.83443564),
        (0.97949594, 1.0675149, 0.6329687),
        (0.531663, 0.5955577, 1.7500148),
        (0.9624706, 0.72462326, 1.1481868),
        (0.83221924, 1.0490936, 1.687584),
        (0.21132214, 0.4206159, 0.5372846),
        (1.4440073, 1.8970833, 0.26985747),
        (1.0294262, 1.4040797, 0.87554324),
        (1.3766412, 0.65521795, 1.6813129),
        (0.6650819, 0.71111923, 1.298853),
        (0.41999173, 0.37906948, 1.7513971),
        (0.59359556, 0.5912492, 0.73919016),
        (0.50867593, 0.50656086, 0.30136237),
        (1.1511526, 1.0546296, 0.49706793),
        (0.47535285, 0.49249494, 0.5802117),
    ),
    score_thr=0.05,
)

data = dict(
    type='ScanNetDataset',
    data_root='data/scannet',
    num_points=40000,
    max_gt=128,
    batch_size_per_chip=8,
)

optimizer = dict(lr=8e-3, weight_decay=1e-2, grad_clip_norm=10.0)
schedule = dict(total_epochs=36, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=4, max_keep=5)
