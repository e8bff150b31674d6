"""SECOND KITTI 3-class, bf16 compute.

Mirrors configs/second/hv_second_secfpn_fp16_6x8_80e_kitti-3d-3class.py
— the reference's fp16 mixed-precision maps to bfloat16 on TPU (same
dynamic range as f32, no loss scaling needed).
"""

_base_ = 'hv_second_kitti_3class.py'

model = dict(dtype='bfloat16')
