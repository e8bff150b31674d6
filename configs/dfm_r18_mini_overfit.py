"""DfM-R18 mini-KITTI overfit recipe — the real-data train->AP loop.

Trains the bare DfM student on the reference's checked-in mini KITTI
fixture (2 real frames, real velodyne + calib:
/root/reference/tests/data/kitti, the same data the reference's own
dataset tests consume — tests/test_data/test_datasets/
test_kitti_dataset.py:1) until `tools/test.py --eval kitti` saturates
on those frames. Build the data root first:

  python tools/make_mini_kitti.py data/mini_kitti
  python tools/train.py configs/dfm_r18_mini_overfit.py \
      --work-dir work_dirs/mini_overfit --max-steps 300
  python tools/test.py configs/dfm_r18_mini_overfit.py \
      --checkpoint work_dirs/mini_overfit/ckpts --eval kitti

Shapes are cut for CPU/one-chip turnaround: 256x640 crop (the bottom/
center crop keeps both the frame-000000 pedestrian and the velodyne
depth pixels — which project at original rows ~120-155 — in view),
48 depth bins over [2, 26] m (0.5 m resolution at the GT depth of
8.4 m), 26x13 m BEV.
"""

model = dict(
    type='DfM',
    num_classes=3,
    backbone_depth=18,
    depth_num_bins=48,
    depth_min=2.0,
    depth_max=26.0,
    depth_downsample=4,
    point_cloud_range=(2, -12.8, -3, 27.6, 12.8, 1),
    voxel_size=(0.2, 0.2, 0.2),
    anchor_ranges=(
        (2, -12.8, -1.78, 27.6, 12.8, -1.78),
        (2, -12.8, -0.6, 27.6, 12.8, -0.6),
        (2, -12.8, -0.6, 27.6, 12.8, -0.6)),
    cost_sample_factor=4,
    cv_channels=32,
    bev_channels=64,
    normalizer_clamp_value=10.0,
    nms_pre=256,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=20,
)

data = dict(
    type='KittiDataset',
    data_root='data/mini_kitti',
    crop_size=(256, 640),
    scale_range=(1.0, 1.0),
    flip_ratio=0.0,
    num_ref_imgs=1,
    max_gt=8,
    batch_size_per_chip=1,
)

optimizer = dict(
    lr=3e-4,
    weight_decay=0.0,
    grad_clip_norm=35.0,
    warmup_iters=20,
    warmup_ratio=0.1,
    decay_epochs=(250,),
    gamma=0.1,
)

schedule = dict(total_epochs=300, eval_interval=10000, log_interval=20)
checkpoint = dict(interval_epochs=10000, max_keep=2)
