"""ImVoxelNet KITTI car-only.

Mirrors configs/imvoxelnet/imvoxelnet_4x8_kitti-3d-car.py: R50+FPN
image trunk, anchor-grid point sampling to a (216, 248, 12) voxel
volume, outdoor ImVoxel neck, single-class Anchor3DHead.
"""

model = dict(
    type='ImVoxelNet',
    num_classes=1,
    feat_channels=64,
    voxel_range=(-0.16, -39.68, -3.08, 68.96, 39.68, 0.76),
    voxel_grid=(12, 248, 216),
    backbone_depth=50,
    anchor_ranges=((-0.16, -39.68, -1.78, 68.96, 39.68, -1.78),),
    anchor_sizes=((3.9, 1.6, 1.56),),
    anchor_rotations=(0.0, 1.57),
    assigner_cfgs=(
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),),
    nms_pre=1024,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=100,
)

data = dict(
    type='KittiDataset',
    data_root='data/kitti',
    input_size=(384, 1280),
    batch_size_per_chip=4,
)

optimizer = dict(lr=1e-4, weight_decay=1e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=12, eval_interval=1, log_interval=50)
checkpoint = dict(interval_epochs=1, max_keep=5)
