"""Group-Free 3D on ScanNet (18-class indoor, L6 x O256).

Mirrors the reference's configs/_base_/models/groupfree3d.py (+ the
groupfree3d L6-O256 ScanNet recipe): PointNet2SASSG 4 SA + 2 FP
backbone, KPS sampling, 6 transformer decoder layers, 256 proposals,
focal objectness + per-stage box losses.
"""

_SCANNET_MEANS = (
    (0.76966727, 0.8116021, 0.92573744),
    (1.876858, 1.8425595, 1.1931566),
    (0.61328, 0.6148609, 0.7182701),
    (1.3955007, 1.5121545, 0.83443564),
    (0.97949594, 1.0675149, 0.6329687),
    (0.531663, 0.5955577, 1.7500148),
    (0.9624706, 0.72462326, 1.1481868),
    (0.83221924, 1.0490936, 1.6875663),
    (0.21132214, 0.4206159, 0.5372846),
    (1.4440073, 1.8970833, 0.26985747),
    (1.0294262, 1.4040797, 0.87554324),
    (1.3766412, 0.65521795, 1.6813129),
    (0.6650819, 0.71111923, 1.298853),
    (0.41999173, 0.37906948, 1.7513971),
    (0.59359556, 0.5912492, 0.73919016),
    (0.50867593, 0.50656086, 0.30136237),
    (1.1511526, 1.0546296, 0.49706793),
    (0.47535285, 0.49249494, 0.5802117))

model = dict(
    type='GroupFree3DNet',
    num_classes=18,
    num_proposal=256,
    num_decoder_layers=6,
    embed_dims=288,
    num_heads=8,
    mean_sizes=_SCANNET_MEANS,
    sampling_obj_weight=8.0,
    center_weight=10.0,
    size_res_weight=10.0,
)

data = dict(
    type='ScanNetDataset',
    data_root='data/scannet',
    num_points=50000,
    batch_size_per_chip=4,
)

optimizer = dict(lr=6e-3, weight_decay=5e-4, grad_clip_norm=0.1,
                 decay_epochs=(56, 68), gamma=0.1)
schedule = dict(total_epochs=80, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=4, max_keep=5)
