"""ImVoteNet stage-2 on SUN RGB-D (10-class, image-vote fusion).

Mirrors mmdet3d's imvotenet_stage2_16x8_sunrgbd-3d-10class.py
(detectors/imvotenet.py + fusion_layers/vote_fusion.py) at reference
structure: the 2D branch lives IN-GRAPH (ResNet + FPN + ATSS head,
decoded top-k boxes feed VoteFusion) and is frozen, exactly the
stage-2 recipe (imvotenet.py:129-131 freeze_img_branch). Set
freeze_img_branch=False (+ supply gt_bboxes2d) for the stage-1 joint
path, or with_img_branch=False to feed offline 2D detections.
"""

_base_ = ['votenet_sunrgbd.py']

model = dict(
    type='ImVoteNet',
    max_imvote_per_pixel=3,
    img_feat_dim=128,
    loss_weights=(0.4, 0.3, 0.3),
    with_img_branch=True,
    freeze_img_branch=True,
    img_backbone_depth=18,
    img_max_boxes=16,
)
