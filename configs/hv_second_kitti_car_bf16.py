"""SECOND KITTI car-only, bf16 compute.

Mirrors configs/second/hv_second_secfpn_fp16_6x8_80e_kitti-3d-car.py
(fp16 -> bf16 on TPU).
"""

_base_ = 'hv_second_kitti_car.py'

model = dict(dtype='bfloat16')
