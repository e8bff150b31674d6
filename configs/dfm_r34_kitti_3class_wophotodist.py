"""DfM-R34 KITTI 3-class without photometric distortion.

Mirrors configs/dfm/dfm_r34_1x8_kitti-3d-3class_wophotodist.py (same
model; train pipeline drops PhotoMetricDistortion).
"""

_base_ = 'dfm_r34_kitti_3class.py'

data = dict(photometric_distortion=False)
