"""SA-SSD on KITTI 3-class.

Mirrors the reference's sassd config family (detectors/sassd.py +
SparseEncoderSASSD): SECOND voxel baseline + auxiliary point-wise
foreground/center supervision during training.
"""

_base_ = ['hv_second_kitti_3class.py']

model = dict(
    type='SASSD',
    aux_cls_weight=1.0,
    aux_reg_weight=1.0,
)
