"""FCOS3D nuScenes finetune stage.

Mirrors configs/fcos3d/..._finetune.py: resume from the 1x checkpoint
at 10x lower LR (the reference's two-stage FCOS3D recipe).
"""

_base_ = 'fcos3d_r101_nus_mono.py'

optimizer = dict(lr=2e-4)
load_from = 'work_dirs/fcos3d_r101_nus_mono/latest'
