"""FCOS3D-R18 mini-KITTI overfit — the mono-family train->AP loop.

Companion to configs/dfm_r18_mini_overfit.py: trains a shrunk FCOS3D
on the reference's checked-in KITTI fixture frame (pedestrian at 8.4 m)
until `tools/test.py --eval kitti` saturates. Validates the anchor-FREE
decode/eval path (camera-frame boxes, FCOS3DBBoxCoder semantics) end to
end, proving the pos-normalizer loss semantics aren't DfM-specific.

  python tools/make_mini_kitti.py data/mini_kitti
  python tools/train.py configs/fcos3d_r18_mini_overfit.py \
      --work-dir work_dirs/mini_overfit_fcos3d --max-steps 300
  python tools/test.py configs/fcos3d_r18_mini_overfit.py \
      --checkpoint work_dirs/mini_overfit_fcos3d/ckpts --eval kitti

The image is resized 375x1242 -> 192x640 (the pedestrian's 165-px box
stays ~84 px tall, well over the 40-px easy-difficulty floor) and the
camera intrinsics are scaled to match.
"""

model = dict(
    type='FCOSMono3D',
    backbone_depth=18,
    num_classes=3,
    in_channels=64,
    feat_channels=64,
    stacked_convs=2,
    strides=(8, 16, 32, 64, 128),
    center_sample_radius=1.5,
    centerness_alpha=2.5,
    dir_offset=0.7854,
    nms_pre=256,
    score_thr=0.1,
    nms_thr=0.25,
    max_num=20,
)

data = dict(
    type='KittiMono',
    data_root='data/mini_kitti',
    img_hw=(192, 640),
    max_gt=8,
    batch_size_per_chip=1,
)

optimizer = dict(lr=3e-4, weight_decay=0.0, grad_clip_norm=35.0,
                 warmup_iters=20, warmup_ratio=0.1,
                 decay_epochs=(250,), gamma=0.1)
schedule = dict(total_epochs=300, eval_interval=10000, log_interval=20)
checkpoint = dict(interval_epochs=10000, max_keep=2)
