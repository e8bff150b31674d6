"""PGD nuScenes 2x schedule (configs/pgd/..._2x_nus-mono3d.py)."""

_base_ = 'pgd_r101_nus_mono_1x.py'

schedule = dict(total_epochs=24)
