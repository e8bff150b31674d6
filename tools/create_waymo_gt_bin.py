"""Build the camera-only Waymo GT .bin for (LET-)mAP evaluation.

Equivalent of the reference's tools/create_waymo_gt_bin.py:18-81, which
walks raw TFRecords with the waymo devkit: keeps labels that project
into at least one camera, uses the camera-synced box when cam_sync, and
writes `Objects` protos with score 0.5.

This version has two sources:
  * --infos: hermetic path from converted info pkls (each info carries
    'context_name', 'timestamp_micros' and an 'annos' dict with
    vehicle-frame 'gt_boxes_3d' (N, 7 bottom-center), 'labels',
    'camera_names' (most visible camera per object, '' = not visible),
    optional 'camera_synced_boxes_3d' and 'num_lidar_points').
  * --tfrecord-dir: raw TFRecords via the waymo devkit (guarded import;
    unavailable in this image).

Usage:
    python tools/create_waymo_gt_bin.py --infos infos_val.pkl \
        --out gt.bin [--no-cam-sync]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfm_tpu.evaluation.waymo_proto import (Box, ObjectPred,  # noqa: E402
                                            encode_objects)

WAYMO_TYPE_BY_LABEL = (1, 2, 4)  # Car, Pedestrian, Cyclist


def _box7_to_proto(b):
    return Box(center_x=float(b[0]), center_y=float(b[1]),
               center_z=float(b[2] + b[5] / 2), length=float(b[3]),
               width=float(b[4]), height=float(b[5]), heading=float(b[6]))


def gt_objects_from_infos(infos, cam_sync=True, min_points=1):
    objs = []
    for info in infos:
        annos = info.get('annos', {})
        boxes = np.asarray(annos.get('gt_boxes_3d',
                                     np.zeros((0, 7)))).reshape(-1, 7)
        labels = np.asarray(annos.get('labels',
                                      np.zeros((len(boxes),), int)))
        cams = annos.get('camera_names', [''] * len(boxes))
        synced = annos.get('camera_synced_boxes_3d', boxes)
        synced = np.asarray(synced).reshape(-1, 7)
        npts = np.asarray(annos.get('num_lidar_points',
                                    np.full((len(boxes),), min_points)))
        for i in range(len(boxes)):
            if int(labels[i]) < 0 or int(labels[i]) >= len(
                    WAYMO_TYPE_BY_LABEL):
                continue
            if npts[i] < min_points:
                continue
            if cam_sync and not cams[i]:
                continue   # reference: skip GT not visible in any camera
            main = _box7_to_proto(synced[i] if cam_sync else boxes[i])
            objs.append(ObjectPred(
                box=main, type=WAYMO_TYPE_BY_LABEL[int(labels[i])],
                score=0.5, context_name=info['context_name'],
                frame_timestamp_micros=int(info['timestamp_micros']),
                num_lidar_points_in_box=int(npts[i]),
                most_visible_camera_name=cams[i] or '',
                camera_synced_box=_box7_to_proto(synced[i])))
    return objs


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--infos', help='converted info pkl')
    p.add_argument('--tfrecord-dir', help='raw TFRecord dir (needs the '
                   'waymo devkit)')
    p.add_argument('--out', required=True)
    p.add_argument('--no-cam-sync', action='store_true')
    args = p.parse_args()

    if args.tfrecord_dir:
        try:
            from waymo_open_dataset import dataset_pb2  # noqa: F401
        except ImportError:
            raise SystemExit('waymo-open-dataset is not installed; use '
                             '--infos with converted info pkls instead')
        raise SystemExit('raw TFRecord path not wired in this image; '
                         'convert to infos first (tools/create_data.py)')

    with open(args.infos, 'rb') as f:
        infos = pickle.load(f)
    objs = gt_objects_from_infos(infos, cam_sync=not args.no_cam_sync)
    with open(args.out, 'wb') as f:
        f.write(encode_objects(objs))
    print(f'wrote {len(objs)} GT objects -> {args.out}')


if __name__ == '__main__':
    main()
