"""SECOND KITTI 3-class trained with the FreeAnchor bag likelihood.

The upstream mmdet3d FreeAnchor recipe (configs/free_anchor/,
mmdet3d/models/dense_heads/free_anchor3d_head.py:49-285 — vendored by
the reference) applied to the KITTI SECOND baseline: same
Anchor3DHead tower as hv_second_kitti_3class.py, but MaxIoU target
assignment is replaced by the FreeAnchor positive/negative bag losses
(dfm_tpu/models/heads/free_anchor3d.py).
"""

_base_ = './hv_second_kitti_3class.py'

model = dict(
    bbox_head='free_anchor',
    pre_anchor_topk=25,
    free_anchor_bbox_thr=0.6,
)
