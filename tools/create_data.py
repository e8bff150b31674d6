#!/usr/bin/env python
"""Dataset preparation (equivalent of the reference's tools/create_data.py
kitti path incl. temporal sweeps via raw-sequence poses).

Usage:
  python tools/create_data.py kitti --root data/kitti \
      --splits train val
Expects ImageSets/{train,val}.txt under the root (standard KITTI layout);
falls back to globbing image_2 when absent.
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('dataset', choices=['kitti', 'waymo', 'nuscenes',
                                       'sunrgbd', 'scannet', 's3dis',
                                       'lyft'])
    p.add_argument('--root', default='data/kitti')
    p.add_argument('--splits', nargs='*', default=['train', 'val'])
    p.add_argument('--version', default='v1.01-train',
                   help='lyft table version directory')
    p.add_argument('--max-sweeps', type=int, default=10)
    p.add_argument('--areas', nargs='*',
                   default=['Area_1', 'Area_2', 'Area_3', 'Area_4',
                            'Area_5', 'Area_6'],
                   help='s3dis areas to convert')
    p.add_argument('--with-gt-db', action='store_true',
                   help='also build the cut-and-paste GT database from '
                        'the train split (reference '
                        'create_groundtruth_database)')
    args = p.parse_args()

    if args.dataset == 'waymo':
        # TFRecord -> kitti_format via the DEVKIT-FREE wire parser
        # (tools/data_converter/waymo_raw.py)
        raise SystemExit(
            'waymo: run tools/data_converter/waymo_converter.py '
            '--tfrecord-dir ... --out <root>/kitti_format (hermetic — '
            'no devkit needed), then tools/create_waymo_gt_bin.py '
            'for the eval GT bin')
    if args.dataset == 'lyft':
        from dfm_tpu.data.lyft_converter import create_lyft_infos
        tr, va = create_lyft_infos(args.root, args.version,
                                   max_sweeps=args.max_sweeps)
        for split, data in (('train', tr), ('val', va)):
            out = os.path.join(args.root, f'lyft_infos_{split}.pkl')
            with open(out, 'wb') as f:
                pickle.dump(data, f)
            print(f'wrote {len(data["infos"])} infos -> {out}')
        return
    if args.dataset in ('sunrgbd', 'scannet', 's3dis'):
        from dfm_tpu.data import indoor_converter as ic
        if args.dataset == 's3dis':
            for area in args.areas:
                try:
                    infos = ic.build_s3dis_infos(args.root, area)
                except FileNotFoundError:
                    print(f'{area}: no s3dis_data files, skipped')
                    continue
                out = os.path.join(args.root,
                                   f's3dis_infos_{area}.pkl')
                ic.write_infos(infos, out)
                print(f'wrote {len(infos)} infos -> {out}')
            return
        build = (ic.build_sunrgbd_infos if args.dataset == 'sunrgbd'
                 else ic.build_scannet_infos)
        for split in args.splits:
            infos = build(args.root, split)
            out = os.path.join(args.root,
                               f'{args.dataset}_infos_{split}.pkl')
            ic.write_infos(infos, out)
            print(f'wrote {len(infos)} infos -> {out}')
        return
    if args.dataset == 'nuscenes':
        # LiDAR info path: devkit-free (raw JSON tables), reference
        # create_nuscenes_infos semantics
        from dfm_tpu.data.nuscenes_converter import create_nuscenes_infos
        version = args.version if args.version.startswith('v1.0') \
            else 'v1.0-trainval'
        tr, va = create_nuscenes_infos(args.root, version,
                                       max_sweeps=args.max_sweeps)
        for split, data in (('train', tr), ('val', va)):
            out = os.path.join(args.root,
                               f'nuscenes_infos_{split}.pkl')
            with open(out, 'wb') as f:
                pickle.dump(data, f)
            print(f'wrote {len(data["infos"])} infos -> {out}')
        # mono/2D export path (needs the devkit's image-level walk)
        try:
            from dfm_tpu.data.nuscenes_converter import \
                build_nuscenes_mono_infos
            for split in args.splits:
                infos = build_nuscenes_mono_infos(args.root, split)
                out = os.path.join(args.root,
                                   f'nuscenes_infos_mono_{split}.pkl')
                with open(out, 'wb') as f:
                    pickle.dump(infos, f)
                print(f'wrote {len(infos)} infos -> {out}')
        except SystemExit as e:
            print(f'mono export skipped: {e}')
        return

    from dfm_tpu.data.kitti import build_kitti_infos

    for split in args.splits:
        ids_file = os.path.join(args.root, 'ImageSets', f'{split}.txt')
        if os.path.exists(ids_file):
            with open(ids_file) as f:
                ids = [int(x) for x in f.read().split()]
        else:
            imgs = sorted(glob.glob(
                os.path.join(args.root, 'training', 'image_2', '*.png')))
            ids = [int(os.path.basename(x)[:-4]) for x in imgs]
            print(f'no ImageSets/{split}.txt; globbed {len(ids)} frames')
        infos = build_kitti_infos(args.root, ids)
        out = os.path.join(args.root, f'kitti_infos_{split}.pkl')
        with open(out, 'wb') as f:
            pickle.dump(infos, f)
        print(f'wrote {len(infos)} infos -> {out}')
        if args.with_gt_db and split == 'train':
            from dfm_tpu.data.dbsampler import create_gt_database
            from dfm_tpu.data.kitti import KittiDataset
            ds = KittiDataset(args.root, infos, train=True)
            db = create_gt_database(
                infos, args.root, args.root,
                lambda info: ds._load_points_pl(info))
            print(f'wrote GT database -> {db}')


if __name__ == '__main__':
    main()
