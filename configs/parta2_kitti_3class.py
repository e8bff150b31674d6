"""Part-A2 KITTI 3-class (sparse U-Net + part-aggregation RoI).

Mirrors mmdet3d's hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py
(detectors/parta2.py + middle_encoders/sparse_unet.py +
roi_heads/part_aggregation_roi_head.py). See
models/detectors/parta2.py for the static-capacity sparse U-Net and
the RoI-aware pooling notes.
"""

_base_ = ['hv_second_kitti_3class.py']

model = dict(
    type='PartA2',
    voxel_size=(0.05, 0.05, 0.1),
    sparse_shape=(41, 1600, 1408),
    voxel_capacity=16000,
    unet_base=16,
    num_proposals=64,
    roi_grid=7,
)
