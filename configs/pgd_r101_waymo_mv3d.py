"""PGD R101-DCN Waymo-D3 multi-view 3D.

Mirrors configs/pgd/pgd_r101_fpn_gn-head_dcn_3x16_2x_waymoD3-mv3d.py:
same mono head run per view; per-view detections are merged in the
global (lidar) frame with cross-view NMS at evaluation
(data/waymo.py merge path).
"""

_base_ = 'pgd_r101_waymo_mono3d.py'

data = dict(load_mode='cam_frame', merge_multi_view=True)
