"""nuScenes raw data -> info pkls.

Two paths, mirroring the reference's
`tools/data_converter/nuscenes_converter.py`:

* `create_nuscenes_infos` — the LiDAR-info path
  (`create_nuscenes_infos` -> `_fill_trainval_infos`, reference
  :19-215) re-implemented DEVKIT-FREE like `lyft_converter.py`: the
  database JSON tables are read directly, the pose algebra
  (global -> ego -> lidar box transform, per-sweep/per-cam
  sensor2lidar RT — `obtain_sensor2top`, reference :276-334) is plain
  numpy quaternions, and annotation velocities are the devkit's
  finite-difference `box_velocity` semantics (prev/next annotation of
  the same instance, max_time_diff 1.5 s, NaN when isolated). Output
  schema matches the reference's checked-in fixture
  (tests/data/nuscenes/nus_info.pkl) key-for-key; feeds
  `NuScenesDataset` (CBGS LiDAR recipes).
* `build_nuscenes_mono_infos` — the mono/2D export path
  (`export_2d_annotation`), which needs the devkit's image-level
  walk; the devkit import stays lazy/guarded (absent in this image).
"""

import os

import numpy as np

from .lyft_converter import _quat_inv, _quat_mul, _sensor2top, \
    _Tables, quat_to_mat, quat_yaw
from .nuscenes import NUS_ATTRS, NUS_CLASSES

__all__ = ['build_nuscenes_mono_infos', 'create_nuscenes_infos',
           'NUS_NAME_MAP']

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


# devkit NameMapping (nuscenes_dataset.py NameMapping) — shared by the
# LiDAR info path; the mono path's map above is its attribute-aware
# superset
NUS_NAME_MAP = dict(_NAME_MAP)


def _box_velocity(tb, ann, max_time_diff=1.5):
    """Devkit `NuScenes.box_velocity` semantics: finite difference of
    the same instance's prev/next annotation positions over sample
    timestamps; NaN when the annotation is temporally isolated or the
    gap exceeds `max_time_diff` (doubled when both sides exist)."""
    has_prev = bool(ann['prev'])
    has_next = bool(ann['next'])
    if not has_prev and not has_next:
        return np.full(3, np.nan)
    first = tb.get('sample_annotation', ann['prev']) if has_prev else ann
    last = tb.get('sample_annotation', ann['next']) if has_next else ann
    pos_first = np.asarray(first['translation'], np.float64)
    pos_last = np.asarray(last['translation'], np.float64)
    t_first = 1e-6 * tb.get('sample', first['sample_token'])['timestamp']
    t_last = 1e-6 * tb.get('sample', last['sample_token'])['timestamp']
    if has_next and has_prev:
        max_time_diff *= 2
    dt = t_last - t_first
    if dt > max_time_diff or dt <= 0:
        return np.full(3, np.nan)
    return (pos_last - pos_first) / dt


def create_nuscenes_infos(root, version='v1.0-trainval', max_sweeps=10,
                          val_scene_names=None):
    """Build (train_infos, val_infos) dicts from the raw JSON tables.

    `val_scene_names`: scene-name set for the split. The official
    700/150 train/val scene-name lists live in the devkit
    (nuscenes.utils.splits); devkit-free operation reads
    {root}/val.txt (one scene name per line) when the arg is None —
    same convention as `create_lyft_infos`.
    """
    tb = _Tables(root, version)
    if val_scene_names is None:
        val_txt = os.path.join(root, 'val.txt')
        if os.path.exists(val_txt):
            with open(val_txt) as f:
                val_scene_names = {ln.strip() for ln in f if ln.strip()}
        else:
            val_scene_names = set()

    train, val = [], []
    samples = sorted(tb.t['sample'].values(),
                     key=lambda s: s['timestamp'])
    for sample in samples:
        lidar_sd = None
        for sd in tb.sd_by_sample.get(sample['token'], []):
            if sd['is_key_frame'] and \
                    tb.channel(sd).startswith('LIDAR_TOP'):
                lidar_sd = sd
                break
        if lidar_sd is None:
            continue
        cs = tb.get('calibrated_sensor',
                    lidar_sd['calibrated_sensor_token'])
        pose = tb.get('ego_pose', lidar_sd['ego_pose_token'])
        info = {
            'lidar_path': lidar_sd['filename'],
            'token': sample['token'],
            'sweeps': [],
            'cams': {},
            'lidar2ego_translation': cs['translation'],
            'lidar2ego_rotation': cs['rotation'],
            'ego2global_translation': pose['translation'],
            'ego2global_rotation': pose['rotation'],
            'timestamp': sample['timestamp'],
        }
        l2e_r_mat = quat_to_mat(cs['rotation'])
        e2g_r_mat = quat_to_mat(pose['rotation'])
        l2e_t = np.asarray(cs['translation'], np.float64)
        e2g_t = np.asarray(pose['translation'], np.float64)

        for sd in tb.sd_by_sample.get(sample['token'], []):
            ch = tb.channel(sd)
            if sd['is_key_frame'] and ch.startswith('CAM'):
                cam = _sensor2top(tb, sd, l2e_t, l2e_r_mat, e2g_t,
                                  e2g_r_mat, ch)
                cam['cam_intrinsic'] = np.asarray(
                    tb.get('calibrated_sensor',
                           sd['calibrated_sensor_token'])
                    ['camera_intrinsic'])
                info['cams'][ch] = cam

        sd_rec = lidar_sd
        while len(info['sweeps']) < max_sweeps and sd_rec['prev'] \
                and sd_rec['prev'] in tb.t['sample_data']:
            sd_rec = tb.get('sample_data', sd_rec['prev'])
            info['sweeps'].append(_sensor2top(
                tb, sd_rec, l2e_t, l2e_r_mat, e2g_t, e2g_r_mat,
                'lidar'))

        anns = tb.ann_by_sample.get(sample['token'], [])
        locs, dims, rots, names, vels = [], [], [], [], []
        npts, nrad, valid = [], [], []
        q_l2e_inv = _quat_inv(cs['rotation'])
        q_e2g_inv = _quat_inv(pose['rotation'])
        inv_rot = (np.linalg.inv(e2g_r_mat).T @
                   np.linalg.inv(l2e_r_mat).T)
        for a in anns:
            c = np.asarray(a['translation'], np.float64)
            c = quat_to_mat(q_e2g_inv) @ (c - e2g_t)
            c = quat_to_mat(q_l2e_inv) @ (c - l2e_t)
            q = _quat_mul(q_l2e_inv,
                          _quat_mul(q_e2g_inv, a['rotation']))
            inst = tb.get('instance', a['instance_token'])
            cat = tb.get('category', inst['category_token'])['name']
            velo = _box_velocity(tb, a)
            velo = np.array([velo[0], velo[1], 0.0]) @ inv_rot
            locs.append(c)
            dims.append(a['size'])            # devkit wlh
            rots.append(quat_yaw(q))
            names.append(NUS_NAME_MAP.get(cat, cat))
            vels.append(velo[:2])
            npts.append(a['num_lidar_pts'])
            nrad.append(a['num_radar_pts'])
            valid.append((a['num_lidar_pts'] + a['num_radar_pts']) > 0)
        locs = np.asarray(locs, np.float64).reshape(-1, 3)
        dims = np.asarray(dims, np.float64).reshape(-1, 3)
        rots = np.asarray(rots, np.float64).reshape(-1, 1)
        # wlh -> (l, w, h) = x/y/z sizes in the box frame
        # (reference nuscenes_converter.py:255-259)
        info['gt_boxes'] = np.concatenate(
            [locs, dims[:, [1, 0, 2]], rots], axis=1)
        info['gt_names'] = np.array(names)
        info['gt_velocity'] = np.asarray(vels,
                                         np.float64).reshape(-1, 2)
        info['num_lidar_pts'] = np.array(npts)
        info['num_radar_pts'] = np.array(nrad)
        info['valid_flag'] = np.array(valid, dtype=bool).reshape(-1)

        scene = tb.get('scene', sample['scene_token'])
        (val if scene['name'] in val_scene_names else train).append(info)

    meta = {'version': version}
    return ({'infos': train, 'metadata': meta},
            {'infos': val, 'metadata': meta})
