"""PGD R101 monocular depth-aware 3D detection on KITTI.

Mirrors configs/pgd/pgd_r101_... hyperparameters (depth classifier over
uniform bins, uncertainty weighting).
"""

_base_ = 'fcos3d_r101_kitti_mono.py'

model = dict(
    type='PGD',
    use_depth_classifier=True,
    depth_range=(0.0, 70.0),
    depth_unit=10.0,
    depth_branch=(64,),
    weight_dim=1,
    uncertainty_alpha=1.0,
)
