"""VoteNet on SUN RGB-D (10-class indoor).

Mirrors mmdet3d's votenet_16x8_sunrgbd-3d-10class.py hyperparameters
(the VoteNet family the reference inherits; detectors/votenet.py +
dense_heads/vote_head.py).
"""

model = dict(
    type='VoteNet',
    num_classes=10,
    num_heading_bins=12,
    num_proposals=256,
    vote_radius=0.3,
    vote_k=16,
    mean_sizes=(
        (2.114256, 1.620300, 0.927272),
        (0.791118, 1.279516, 0.718182),
        (0.923508, 1.867419, 0.845495),
        (0.591958, 0.552978, 0.827272),
        (0.699104, 0.454178, 0.75625),
        (0.69519, 1.346299, 0.736364),
        (0.528526, 1.002642, 1.172878),
        (0.500618, 0.632163, 0.683424),
        (0.404671, 1.071108, 1.688889),
        (0.76584, 1.398258, 0.472728),
    ),
    score_thr=0.05,
)

data = dict(
    type='SUNRGBDDataset',
    data_root='data/sunrgbd',
    num_points=20000,
    batch_size_per_chip=8,
)

optimizer = dict(lr=8e-3, weight_decay=1e-2, grad_clip_norm=10.0)
schedule = dict(total_epochs=36, eval_interval=4, log_interval=50)
checkpoint = dict(interval_epochs=4, max_keep=5)
