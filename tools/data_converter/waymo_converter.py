"""Waymo TFRecord -> kitti_format converter (guarded devkit import).

Equivalent of the reference's `tools/data_converter/waymo_converter.py`
(683 LoC, drives the `Waymo2KITTI` conversion inside create_data):
walks raw `.tfrecord` segments with the waymo-open-dataset devkit and
writes the kitti_format tree the WaymoDataset assembly consumes
(`dfm_tpu/data/waymo.py`):

    kitti_format/
      training/image_{0..4}/{prefix}{seq:03d}{frame:03d}.png
      training/calib/...txt          (P0..P4, R0_rect, Tr_velo_to_cam)
      training/pose/...txt           (4x4 ego2global)
      training/label_{0..4}/ label_all/ ...txt
      waymo_infos_{split}.pkl        (per-frame dict: images, calib,
                                      pose, annos, timestamp, context)

The devkit + TensorFlow are OPTIONAL (absent in the TPU image): the
module imports lazily and the CLI degrades with a clear message, same
contract as tools/create_waymo_gt_bin.py.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

CAMERAS = ('FRONT', 'FRONT_LEFT', 'FRONT_RIGHT', 'SIDE_LEFT',
           'SIDE_RIGHT')
CLASS_MAP = {1: 'Car', 2: 'Pedestrian', 4: 'Cyclist'}  # devkit types


def _devkit():
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
        return dataset_pb2
    except ImportError as e:
        raise SystemExit(
            'waymo-open-dataset + tensorflow are required for raw '
            'TFRecord conversion and are not in this image; run the '
            'converter on a host that has them, then train/eval here '
            f'({e})')


def convert_segment(record_path, out_root, seq_id, prefix='0',
                    save_images=True):
    """One .tfrecord segment -> kitti_format files + info dicts.

    Devkit-free: frames are decoded by the hand-rolled wire parser
    (waymo_raw.py, validated against the reference's checked-in mini
    TFRecord + expected kitti_format infos in tests/test_waymo_raw.py).
    """
    from .waymo_raw import (camera_projection, parse_frame,
                            read_tfrecord)
    infos = []
    for fi, rec in enumerate(read_tfrecord(record_path)):
        frame = parse_frame(rec)
        name = f'{prefix}{seq_id:03d}{fi:03d}'
        info = dict(context=frame['context_name'],
                    timestamp=frame['timestamp'],
                    token=name, images={}, calib={}, annos=[])

        pose = frame['pose']
        _write_txt(out_root, 'pose', name, pose.reshape(-1))
        info['pose'] = pose

        calib_lines = {}
        for cc in frame['cameras']:
            cam_idx = cc['name'] - 1
            p, tr = camera_projection(cc)
            calib_lines[f'P{cam_idx}'] = p[:3]
            calib_lines[f'Tr_velo_to_cam_{cam_idx}'] = tr
        info['calib'] = calib_lines
        _write_calib(out_root, name, calib_lines)

        if save_images:
            for cam_name, img in frame['images'].items():
                cam_idx = cam_name - 1
                d = os.path.join(out_root, 'training',
                                 f'image_{cam_idx}')
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, name + '.jpg'), 'wb') as f:
                    f.write(img)
                info['images'][cam_idx] = \
                    f'training/image_{cam_idx}/{name}.jpg'

        annos = []
        for label in frame['labels']:
            if label['type'] not in CLASS_MAP:
                continue
            b = label['box']
            annos.append(dict(
                name=CLASS_MAP[label['type']],
                box3d=[b['center_x'], b['center_y'],
                       b['center_z'] - b['height'] / 2, b['width'],
                       b['length'], b['height'], b['heading']],
                num_points=label['num_points'],
                track_id=label['id'],
                most_visible_camera=''))
        info['annos'] = annos
        infos.append(info)
    return infos


def _write_txt(root, sub, name, vals):
    d = os.path.join(root, 'training', sub)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name + '.txt'), 'w') as f:
        f.write(' '.join(f'{v:.12e}' for v in vals) + '\n')


def _write_calib(root, name, calib):
    d = os.path.join(root, 'training', 'calib')
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name + '.txt'), 'w') as f:
        for k, v in calib.items():
            f.write(k + ': ' +
                    ' '.join(f'{x:.12e}' for x in
                             np.asarray(v).reshape(-1)) + '\n')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--tfrecord-dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--split', default='training',
                   choices=['training', 'validation', 'testing'])
    p.add_argument('--prefix', default=None,
                   help='filename prefix digit (default by split)')
    p.add_argument('--no-images', action='store_true')
    args = p.parse_args()

    prefix = args.prefix or {'training': '0', 'validation': '1',
                             'testing': '2'}[args.split]
    import glob
    records = sorted(glob.glob(
        os.path.join(args.tfrecord_dir, '*.tfrecord')))
    if not records:
        raise SystemExit(f'no .tfrecord under {args.tfrecord_dir}')
    all_infos = []
    for si, rec in enumerate(records):
        all_infos += convert_segment(rec, args.out, si, prefix,
                                     save_images=not args.no_images)
        print(f'[{si + 1}/{len(records)}] {os.path.basename(rec)}')
    out = os.path.join(args.out, f'waymo_infos_{args.split}.pkl')
    with open(out, 'wb') as f:
        pickle.dump(all_infos, f)
    print(f'wrote {len(all_infos)} frame infos -> {out}')


if __name__ == '__main__':
    main()
