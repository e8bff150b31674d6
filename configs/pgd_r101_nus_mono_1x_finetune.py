"""PGD nuScenes 1x finetune (configs/pgd/..._1x_nus-mono3d_finetune.py)."""

_base_ = 'pgd_r101_nus_mono_1x.py'

optimizer = dict(lr=4e-4)
load_from = 'work_dirs/pgd_r101_nus_mono_1x/latest'
