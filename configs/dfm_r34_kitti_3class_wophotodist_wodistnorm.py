"""DfM-R34 KITTI 3-class, no photometric distortion, no distributed
loss normalization.

Mirrors configs/dfm/dfm_r34_1x8_kitti-3d-3class_wophotodist_wodistnorm
.py: additionally disables the cross-replica (dist_reduce_mean /
pmean) averaging of loss normalizers — each replica normalizes by its
local positive count.
"""

_base_ = 'dfm_r34_kitti_3class_wophotodist.py'

model = dict(dist_norm=False)
