"""nuScenes raw data -> mono info pkl (guarded devkit import).

Equivalent of the reference's nuScenes mono converter
(tools/data_converter/nuscenes_converter.py export_2d_annotation
path): walks the official `nuscenes-devkit` database, projects every
sample's annotations into each camera and emits the per-image info
dicts `NuScenesMonoDataset` consumes (data/nuscenes.py). The devkit is
an optional dependency (absent in the TPU image) — import is lazy.
"""

import os

import numpy as np

from .nuscenes import NUS_ATTRS, NUS_CLASSES

__all__ = ['build_nuscenes_mono_infos']

CAMS = ('CAM_FRONT', 'CAM_FRONT_LEFT', 'CAM_FRONT_RIGHT', 'CAM_BACK',
        'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')

# devkit detection_name mapping (official category -> class)
_NAME_MAP = {
    'vehicle.car': 'car', 'vehicle.truck': 'truck',
    'vehicle.trailer': 'trailer', 'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.bicycle': 'bicycle', 'vehicle.motorcycle': 'motorcycle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.barrier': 'barrier',
}


def build_nuscenes_mono_infos(data_root, split='train',
                              version='v1.0-trainval'):
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils.splits import create_splits_scenes
    except ImportError as e:
        raise SystemExit(
            'the nuscenes-devkit is required for raw conversion and is '
            'not in this image; run this step where it is installed '
            f'({e})')

    nusc = NuScenes(version=version, dataroot=data_root, verbose=False)
    scene_names = set(create_splits_scenes()[split])
    infos = []
    for sample in nusc.sample:
        scene = nusc.get('scene', sample['scene_token'])
        if scene['name'] not in scene_names:
            continue
        for cam in CAMS:
            sd_token = sample['data'][cam]
            sd = nusc.get('sample_data', sd_token)
            cs = nusc.get('calibrated_sensor',
                          sd['calibrated_sensor_token'])
            cam2img = np.eye(4)
            cam2img[:3, :3] = np.asarray(cs['camera_intrinsic'])
            boxes, names, attrs = [], [], []
            for box in nusc.get_boxes(sd_token):
                name = _NAME_MAP.get(box.name)
                if name is None:
                    continue
                yaw = box.orientation.yaw_pitch_roll[0]
                ann = nusc.get('sample_annotation', box.token)
                vel = nusc.box_velocity(box.token)[:2]
                vel = np.nan_to_num(vel)
                at = 'None'
                if ann['attribute_tokens']:
                    at = nusc.get('attribute',
                                  ann['attribute_tokens'][0])['name']
                boxes.append(list(box.center) +
                             [box.wlh[0], box.wlh[1], box.wlh[2],
                              yaw] + list(vel))
                names.append(name)
                attrs.append(NUS_ATTRS.index(at)
                             if at in NUS_ATTRS
                             else len(NUS_ATTRS) - 1)
            infos.append(dict(
                token=sd_token,
                img_path=os.path.relpath(
                    os.path.join(data_root, sd['filename']), data_root),
                cam2img=cam2img, width=sd['width'],
                height=sd['height'],
                gt_boxes=np.asarray(boxes, np.float64).reshape(-1, 9),
                gt_names=names,
                gt_attrs=np.asarray(attrs, np.int64)))
    return infos
