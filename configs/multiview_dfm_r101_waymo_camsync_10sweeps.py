"""MV-DfM (MV-FCOS3D++) R101-DCN Waymo cam-sync, temporal 10-sweeps.

Mirrors configs/dfm/multiview-dfm_r101_dcn_2x16_waymoD5-3d-3class_
camsync_10sweeps.py: 2 frames (cur + 1 ref sampled from a 10-sweep
pool), temporal concat fusion, DfMNeck gated mono/stereo BEV collapse,
tighter test-time NMS caps.
"""

_base_ = 'multiview_dfm_r101_waymo_camsync.py'

model = dict(
    num_frames=2,
    frame_fusion='concat',
    neck_3d='dfm',
    nms_pre=500,
    max_num=100,
)

data = dict(max_sweeps=10, num_ref_frames=1)
