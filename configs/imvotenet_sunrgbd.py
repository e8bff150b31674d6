"""ImVoteNet stage-2 on SUN RGB-D (10-class, image-vote fusion).

Mirrors mmdet3d's imvotenet_stage2_16x8_sunrgbd-3d-10class.py
(detectors/imvotenet.py + fusion_layers/vote_fusion.py). The frozen
2D branch is decoupled: 2D detections arrive as model input (see
models/detectors/imvotenet.py docstring).
"""

_base_ = ['votenet_sunrgbd.py']

model = dict(
    type='ImVoteNet',
    max_imvote_per_pixel=3,
    img_feat_dim=128,
    loss_weights=(0.4, 0.3, 0.3),
)
