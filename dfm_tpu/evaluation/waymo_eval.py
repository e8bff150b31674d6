"""Waymo evaluation: KITTI-format results -> Objects bins -> (LET-)mAP.

TPU-native replacement for the reference's Waymo eval path:
  * `KITTI2Waymo` (core/evaluation/waymo_utils/prediction_kitti_to_waymo
    .py:107-186): camera-frame KITTI boxes -> Waymo vehicle-frame
    `Object` protos. The reference re-reads the raw TFRecords per frame
    for `T_front_cam_to_vehicle` / context / timestamp; here those come
    from the per-frame info dicts (produced by the converter or tests),
    so the conversion is hermetic.
  * `WaymoDataset.evaluate` (datasets/waymo_dataset.py:516-720): shells
    out to the official `compute_detection_metrics_main` /
    `compute_detection_let_metrics_main` binary and parses the
    "[LET-mAPL x] [LET-mAP y] [LET-mAPH z]" text. The binary path is
    configurable (WAYMO_METRICS_BIN env or argument); when absent, the
    pure-Python `waymo_let` metric provides fallback numbers
    (calibrated against the binary; see waymo_let.py).
"""

import os
import re
import subprocess

import numpy as np

from .waymo_proto import (KITTI_NAME_TO_TYPE, Box, ObjectPred,
                          decode_objects, encode_objects)

__all__ = ['T_REF_TO_FRONT_CAM', 'kitti_result_to_objects',
           'results_to_bin', 'gt_annos_to_bin', 'run_let_binary',
           'parse_let_text', 'evaluate_waymo']

# kitti ref-cam -> waymo front-cam axes (reference
# prediction_kitti_to_waymo.py:74-77)
T_REF_TO_FRONT_CAM = np.array([[0.0, 0.0, 1.0, 0.0],
                               [-1.0, 0.0, 0.0, 0.0],
                               [0.0, -1.0, 0.0, 0.0],
                               [0.0, 0.0, 0.0, 1.0]])


def _heading_cam_to_waymo(rotation_y):
    h = -(rotation_y + np.pi / 2)
    while h < -np.pi:
        h += 2 * np.pi
    while h > np.pi:
        h -= 2 * np.pi
    return h


def kitti_result_to_objects(kitti_result, t_k2w, context_name,
                            frame_timestamp_micros, score_round=4):
    """One frame's KITTI-format detections -> list of ObjectPred.

    Mirrors `parse_objects` (prediction_kitti_to_waymo.py:107-186):
    bottom-center -> true center (y -= h/2), T_k2w frame transform,
    heading = -(ry + pi/2) wrapped to (-pi, pi].

    Args:
        kitti_result: dict with name, dimensions (l, h, w), location
            (x, y, z bottom center, kitti cam frame), rotation_y, score.
        t_k2w: (4, 4) kitti-cam -> waymo-vehicle transform
            (T_front_cam_to_vehicle @ T_REF_TO_FRONT_CAM).
    """
    out = []
    n = len(kitti_result['name'])
    for i in range(n):
        cls = str(kitti_result['name'][i])
        if cls not in KITTI_NAME_TO_TYPE:
            continue
        le = round(float(kitti_result['dimensions'][i, 0]), score_round)
        he = round(float(kitti_result['dimensions'][i, 1]), score_round)
        wi = round(float(kitti_result['dimensions'][i, 2]), score_round)
        x = round(float(kitti_result['location'][i, 0]), score_round)
        y = round(float(kitti_result['location'][i, 1]), score_round)
        z = round(float(kitti_result['location'][i, 2]), score_round)
        ry = round(float(kitti_result['rotation_y'][i]), score_round)
        score = round(float(kitti_result['score'][i]), score_round)
        y -= he / 2
        xyz = t_k2w @ np.array([x, y, z, 1.0])
        box = Box(center_x=float(xyz[0]), center_y=float(xyz[1]),
                  center_z=float(xyz[2]), length=le, width=wi, height=he,
                  heading=float(_heading_cam_to_waymo(ry)))
        out.append(ObjectPred(
            box=box, type=KITTI_NAME_TO_TYPE[cls], score=score,
            context_name=context_name,
            frame_timestamp_micros=int(frame_timestamp_micros)))
    return out


def results_to_bin(kitti_results, frame_infos, path):
    """Write a predictions .bin for a list of frames.

    Args:
        kitti_results: list of per-frame KITTI-format dicts (must carry
            'sample_idx'; empty frames allowed).
        frame_infos: dict sample_idx -> dict with keys
            'T_front_cam_to_vehicle' (4, 4), 'context_name',
            'timestamp_micros'.
        path: output file.
    """
    objs = []
    for res in kitti_results:
        if len(res.get('sample_idx', [])) == 0:
            continue
        idx = str(res['sample_idx'][0])
        info = frame_infos[idx]
        t_k2w = np.asarray(info['T_front_cam_to_vehicle']) @ \
            T_REF_TO_FRONT_CAM
        objs.extend(kitti_result_to_objects(
            res, t_k2w, info['context_name'], info['timestamp_micros']))
    with open(path, 'wb') as f:
        f.write(encode_objects(objs))
    return len(objs)


def gt_annos_to_bin(gt_objects, path):
    """Write a GT .bin. Each entry must already be an ObjectPred with
    `camera_synced_box` and `most_visible_camera_name` set (the LET
    binary drops GT lacking them — reference create_waymo_gt_bin.py
    builds camera-only GT the same way)."""
    with open(path, 'wb') as f:
        f.write(encode_objects(gt_objects))
    return len(gt_objects)


def _find_binary(kind='let'):
    env = os.environ.get('WAYMO_METRICS_BIN')
    if env and os.path.exists(env):
        return env
    name = ('compute_detection_let_metrics_main' if kind == 'let'
            else 'compute_detection_metrics_main')
    for root in (os.environ.get('WAYMO_METRICS_DIR', ''),
                 '/root/reference/mmdet3d/core/evaluation/waymo_utils'):
        cand = os.path.join(root, name) if root else None
        if cand and os.path.exists(cand):
            return cand
    return None


def run_let_binary(pred_bin, gt_bin, binary=None):
    """Shell out to the official LET metrics binary; returns its stdout
    or None when no binary is available."""
    binary = binary or _find_binary('let')
    if binary is None:
        return None
    out = subprocess.run([binary, pred_bin, gt_bin], capture_output=True,
                         text=True, check=True)
    return out.stdout


def parse_let_text(text):
    """Parse the binary's output into the reference's ap_dict layout
    (waymo_dataset.py:640-706)."""
    ap = {}
    cls_map = {'VEHICLE': 'Vehicle', 'PEDESTRIAN': 'Pedestrian',
               'SIGN': 'Sign', 'CYCLIST': 'Cyclist'}
    for line in text.splitlines():
        m = re.match(
            r'OBJECT_TYPE_TYPE_(\w+)_LEVEL_2: \[LET-mAPL ([\d.e+-]+)\] '
            r'\[LET-mAP ([\d.e+-]+)\] \[LET-mAPH ([\d.e+-]+)\]', line)
        if m:
            cls = cls_map.get(m.group(1))
            if cls:
                ap[f'{cls} mAPL'] = float(m.group(2))
                ap[f'{cls} mAP'] = float(m.group(3))
                ap[f'{cls} mAPH'] = float(m.group(4))
    for suffix in ('mAPL', 'mAP', 'mAPH'):
        if all(f'{c} {suffix}' in ap
               for c in ('Vehicle', 'Pedestrian', 'Cyclist')):
            ap[f'Overall {suffix}'] = (
                ap[f'Vehicle {suffix}'] + ap[f'Pedestrian {suffix}'] +
                ap[f'Cyclist {suffix}']) / 3
    return ap


def evaluate_waymo(pred_bin, gt_bin, binary=None):
    """LET evaluation of two .bin files: the official binary when
    available, otherwise the calibrated pure-Python fallback."""
    text = run_let_binary(pred_bin, gt_bin, binary)
    if text is not None:
        ap = parse_let_text(text)
        ap['_source'] = 'official_binary'
        return ap
    from .waymo_let import let_detection_metrics
    with open(pred_bin, 'rb') as f:
        preds = decode_objects(f.read())
    with open(gt_bin, 'rb') as f:
        gts = decode_objects(f.read())
    ap = let_detection_metrics(preds, gts)
    ap['_source'] = 'python_fallback'
    return ap
