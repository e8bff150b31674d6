"""H3DNet on ScanNet V2 (geometric-primitive refinement).

Mirrors mmdet3d's h3dnet_3x8_scannet-3d-18class.py
(detectors/h3dnet.py + mask_heads/primitive_head.py +
bbox_heads/h3d_bbox_head.py); see models/detectors/h3dnet.py for the
documented reductions (2 towers vs 4, fused matcher).
"""

_base_ = ['votenet_scannet.py']

model = dict(
    type='H3DNet',
    num_backbones=2,
    primitive_radius=0.5,
    primitive_k=8,
)
