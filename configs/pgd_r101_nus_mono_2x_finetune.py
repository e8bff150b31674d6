"""PGD nuScenes 2x finetune (configs/pgd/..._2x_nus-mono3d_finetune.py)."""

_base_ = 'pgd_r101_nus_mono_2x.py'

optimizer = dict(lr=4e-4)
load_from = 'work_dirs/pgd_r101_nus_mono_2x/latest'
