"""dfm_tpu: a TPU-native (JAX/XLA/Pallas/pjit) camera-only 3D detection
framework with the capabilities of Tai-Wang/Depth-from-Motion.

Subpackages:
  core        functional 3D-box geometry, IoU/NMS, anchors, coders, targets
  ops         TPU compute kernels (XLA + Pallas): resize, grid-sample,
              plane-sweep cost volume, frustum-to-voxel lifting
  models      flax modules: backbones, necks, heads, detectors
  data        dataset readers + intrinsics-aware augmentation pipeline
  parallel    mesh / sharding helpers (data parallelism over ICI/DCN)
  runtime     config system, train/eval loops, checkpointing, schedules
  evaluation  KITTI AP / Waymo LET metrics
"""

__version__ = '0.1.0'
