"""MVX-FasterRCNN (LiDAR + camera PointFusion) on KITTI 3-class.

Mirrors mmdet3d's mvx_fpn-second KITTI setup
(detectors/mvx_two_stage.py + fusion_layers/point_fusion.py): image
ResNet+FPN features fused into point features before voxelization,
SECOND-style BEV detector on the fused cloud.
"""

_base_ = ['hv_second_kitti_3class.py']

model = dict(
    type='MVXFasterRCNN',
    img_backbone_depth=18,
    img_channels=64,
    fusion_mid=64,
    max_points_per_voxel=5,
)
