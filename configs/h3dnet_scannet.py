"""H3DNet on ScanNet V2 (geometric-primitive refinement).

Mirrors mmdet3d's h3dnet_3x8_scannet-3d-18class.py
(detectors/h3dnet.py + mask_heads/primitive_head.py +
bbox_heads/h3d_bbox_head.py) at REFERENCE structure: 4 backbone
towers (MultiBackbone), separate surface/line matchers (both radius
0.5, _base_/models/h3dnet.py:254-266) and the per-cue objectness +
semantic sub-scores with their losses (with_cues=True).
"""

_base_ = ['votenet_scannet.py']

model = dict(
    type='H3DNet',
    num_backbones=4,
    with_cues=True,
    surface_radius=0.5,
    line_radius=0.5,
    primitive_k=8,
    near_threshold=0.3,
    far_threshold=0.6,
)
