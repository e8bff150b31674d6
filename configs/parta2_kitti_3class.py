"""Part-A2 KITTI 3-class (sparse U-Net + part-aggregation RoI).

Mirrors mmdet3d's hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-3class.py
(detectors/parta2.py + middle_encoders/sparse_unet.py +
roi_heads/part_aggregation_roi_head.py). See
models/detectors/parta2.py for the static-capacity sparse U-Net and
the RoI-aware pooling notes.

Shipped defaults match the reference structure: RoIAware POINT pooling
(all level-0 voxels falling in each canonical cell; seg features max,
part features avg — part_aggregation_roi_head.py:200-230) at
out_size=14 (_base_/models/parta2.py roi grid). The faster
nearest-voxel-center approximation is the documented opt-OUT
(`roi_pool='voxel_center', roi_grid=7`); the measured A/B gap between
the two modes on the synthetic fixture is printed by
tests/test_parta2.py::test_roi_pool_voxel_center_vs_points_delta
(mean |rcnn_cls delta| / scale, recorded in that test's log output).
"""

_base_ = ['hv_second_kitti_3class.py']

model = dict(
    type='PartA2',
    voxel_size=(0.05, 0.05, 0.1),
    sparse_shape=(41, 1600, 1408),
    voxel_capacity=16000,
    unet_base=16,
    num_proposals=64,
    roi_pool='points',
    roi_grid=14,
)
