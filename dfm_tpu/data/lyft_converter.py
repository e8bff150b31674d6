"""Devkit-free Lyft info converter.

Equivalent of the reference's `tools/data_converter/lyft_converter.py`
(create_lyft_infos -> _fill_trainval_infos, :19-215) without the
lyft-dataset-sdk: the devkit's JSON tables are read directly and the
pose algebra (global -> ego -> lidar box transform, sweep
sensor2lidar RT — nuscenes_converter.py obtain_sensor2top:276-334) is
done with plain numpy quaternions. Output schema matches the
reference's info pkls bit-for-bit in layout:

    {'infos': [{lidar_path, token, sweeps, cams,
                lidar2ego_translation/rotation,
                ego2global_translation/rotation, timestamp,
                gt_boxes (N, 7) [x y z l w h yaw] lidar frame,
                gt_names, num_lidar_pts, num_radar_pts}],
     'metadata': {'version': ...}}

Validated against the reference's checked-in fixture
(tests/data/lyft/lyft_infos.pkl) in tests/test_converters.py.
"""

import json
import os

import numpy as np

__all__ = ['create_lyft_infos', 'quat_to_mat', 'quat_yaw']


def quat_to_mat(q):
    """[w, x, y, z] -> (3, 3) rotation matrix."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_inv(q):
    q = np.asarray(q, np.float64)
    return np.array([q[0], -q[1], -q[2], -q[3]]) / np.dot(q, q)


def quat_yaw(q):
    """yaw_pitch_roll[0] of a [w, x, y, z] quaternion (pyquaternion
    semantics: intrinsic z-y'-x'' Tait-Bryan yaw)."""
    w, x, y, z = [float(v) for v in q]
    return float(np.arctan2(2 * (w * z + x * y),
                            1 - 2 * (y * y + z * z)))


class _Tables:
    """Token-indexed devkit tables of one version directory."""

    def __init__(self, root, version):
        self.root = root
        base = os.path.join(root, version)
        if os.path.isdir(os.path.join(base, version)):
            base = os.path.join(base, version)   # fixture nesting
        self.t = {}
        for name in ('sample', 'sample_data', 'sample_annotation',
                     'scene', 'instance', 'category',
                     'calibrated_sensor', 'ego_pose', 'sensor', 'log'):
            with open(os.path.join(base, f'{name}.json')) as f:
                rows = json.load(f)
            self.t[name] = {r['token']: r for r in rows}
        # reverse indexes the devkit builds on load
        self.sd_by_sample = {}
        for sd in self.t['sample_data'].values():
            self.sd_by_sample.setdefault(sd['sample_token'],
                                         []).append(sd)
        self.ann_by_sample = {}
        for a in self.t['sample_annotation'].values():
            self.ann_by_sample.setdefault(a['sample_token'],
                                          []).append(a)

    def get(self, table, token):
        return self.t[table][token]

    def channel(self, sd):
        cs = self.get('calibrated_sensor', sd['calibrated_sensor_token'])
        return self.get('sensor', cs['sensor_token'])['channel']


def _sensor2top(tb, sd, l2e_t, l2e_r_mat, e2g_t, e2g_r_mat, stype):
    """obtain_sensor2top (reference nuscenes_converter.py:276-334)."""
    cs = tb.get('calibrated_sensor', sd['calibrated_sensor_token'])
    pose = tb.get('ego_pose', sd['ego_pose_token'])
    sweep = {
        'data_path': sd['filename'],
        'type': stype,
        'sample_data_token': sd['token'],
        'sensor2ego_translation': cs['translation'],
        'sensor2ego_rotation': cs['rotation'],
        'ego2global_translation': pose['translation'],
        'ego2global_rotation': pose['rotation'],
        'timestamp': sd['timestamp'],
    }
    l2e_r_s_mat = quat_to_mat(cs['rotation'])
    e2g_r_s_mat = quat_to_mat(pose['rotation'])
    l2e_t_s = np.asarray(cs['translation'], np.float64)
    e2g_t_s = np.asarray(pose['translation'], np.float64)
    inv_prod = np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    r = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ inv_prod
    t = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ inv_prod
    t -= (np.asarray(e2g_t) @ inv_prod +
          np.asarray(l2e_t) @ np.linalg.inv(l2e_r_mat).T)
    sweep['sensor2lidar_rotation'] = r.T
    sweep['sensor2lidar_translation'] = t
    return sweep


def create_lyft_infos(root, version='v1.01-train', max_sweeps=10,
                      val_scene_names=None):
    """Build (train_infos, val_infos) dicts from the raw JSON tables.

    `val_scene_names`: scene-name set for the split (the reference
    reads {root}/{version}/val.txt — same here when None)."""
    tb = _Tables(root, version)
    if val_scene_names is None:
        val_txt = os.path.join(root, 'val.txt')
        if os.path.exists(val_txt):
            with open(val_txt) as f:
                val_scene_names = {ln.strip() for ln in f
                                   if ln.strip()}
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
        locs, dims, rots, names, npts, nrad = [], [], [], [], [], []
        q_l2e_inv = _quat_inv(cs['rotation'])
        q_e2g_inv = _quat_inv(pose['rotation'])
        for a in anns:
            c = np.asarray(a['translation'], np.float64)
            c = quat_to_mat(q_e2g_inv) @ (c - e2g_t)
            c = quat_to_mat(q_l2e_inv) @ (c - l2e_t)
            q = _quat_mul(q_l2e_inv,
                          _quat_mul(q_e2g_inv, a['rotation']))
            inst = tb.get('instance', a['instance_token'])
            cat = tb.get('category', inst['category_token'])['name']
            locs.append(c)
            dims.append(a['size'])            # devkit wlh
            rots.append(quat_yaw(q))
            names.append(cat)
            npts.append(a['num_lidar_pts'])
            nrad.append(a['num_radar_pts'])
        locs = np.asarray(locs, np.float64).reshape(-1, 3)
        dims = np.asarray(dims, np.float64).reshape(-1, 3)
        rots = np.asarray(rots, np.float64).reshape(-1, 1)
        # wlh -> (l, w, h) = x/y/z sizes in the box frame
        # (reference lyft_converter.py:199)
        info['gt_boxes'] = np.concatenate(
            [locs, dims[:, [1, 0, 2]], rots], axis=1)
        info['gt_names'] = np.array(names)
        info['num_lidar_pts'] = np.array(npts)
        info['num_radar_pts'] = np.array(nrad)

        scene = tb.get('scene', sample['scene_token'])
        (val if scene['name'] in val_scene_names else train).append(info)

    meta = {'version': version}
    return ({'infos': train, 'metadata': meta},
            {'infos': val, 'metadata': meta})
