"""Devkit-free Waymo TFRecord Frame parser (protobuf wire format).

The reference's converter requires the `waymo-open-dataset` devkit
(tools/data_converter/waymo_converter.py there shells through its
dataset_pb2). This module decodes the needed Frame fields directly
from the wire format (same approach as dfm_tpu/evaluation/
waymo_proto.py), so TFRecord -> infos conversion runs hermetically:

  Frame:   context=1, timestamp_micros=2, pose=3, images=4,
           laser_labels=6, camera_labels=8, projected_lidar_labels=9
  Context: name=1, camera_calibrations=2 (name=1, intrinsic=2 packed,
           extrinsic=3, width=4, height=5), laser_calibrations=3
  Label:   box=1 (center_x/y/z=1/2/3, length=5?  see BOX_FIELDS),
           metadata=2, type=3, id=4, num_lidar_points_in_box=7
  CameraImage: name=1, image=2

Field numbers verified against the reference repo's checked-in mini
TFRecord (tests/data/waymo/waymo_format/validation/val.tfrecord) by
reproducing its expected kitti_format infos (see
tests/test_waymo_raw.py).
"""

import struct

import numpy as np

__all__ = ['read_tfrecord', 'parse_frame']

# waymo label.proto Box field ids
BOX_FIELDS = {1: 'center_x', 2: 'center_y', 3: 'center_z',
              4: 'width', 5: 'length', 6: 'height', 7: 'heading'}
TYPE_NAMES = {0: 'Unknown', 1: 'Car', 2: 'Pedestrian', 3: 'Sign',
              4: 'Cyclist'}


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f'wire type {wt}')
        yield fn, wt, v


def _doubles(buf):
    """Decode a message of tagged 64-bit doubles OR a packed blob."""
    out = {}
    for fn, wt, v in fields(buf):
        if wt == 1:
            out.setdefault(fn, []).append(struct.unpack('<d', v)[0])
        elif wt == 2 and len(v) % 8 == 0:
            out.setdefault(fn, []).extend(
                struct.unpack(f'<{len(v) // 8}d', v))
    return out


def read_tfrecord(path):
    """Yield raw record bytes (TFRecord framing: u64 len, u32 crc,
    data, u32 crc)."""
    buf = open(path, 'rb').read()
    i = 0
    while i < len(buf):
        n = struct.unpack('<Q', buf[i:i + 8])[0]
        i += 12
        yield buf[i:i + n]
        i += n + 4


def _transform(buf):
    """Transform proto: repeated double transform=1 (16, row-major)."""
    d = _doubles(buf)
    m = np.asarray(d.get(1, np.eye(4).reshape(-1)), np.float64)
    return m.reshape(4, 4)


def _camera_calibration(buf):
    out = dict(name=0, intrinsic=None, extrinsic=np.eye(4),
               width=0, height=0)
    intr = []
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 0:
            out['name'] = v
        elif fn == 2 and wt == 1:      # repeated unpacked doubles
            intr.append(struct.unpack('<d', v)[0])
        elif fn == 2 and wt == 2:      # packed variant
            intr.extend(struct.unpack(f'<{len(v) // 8}d', v))
        elif fn == 3:
            out['extrinsic'] = _transform(v)
        elif fn == 4 and wt == 0:
            out['width'] = v
        elif fn == 5 and wt == 0:
            out['height'] = v
    out['intrinsic'] = np.asarray(intr)
    return out


def _label(buf):
    out = dict(box=None, type=0, id='', num_points=0)
    for fn, wt, v in fields(buf):
        if fn == 1:
            d = _doubles(v)
            out['box'] = {BOX_FIELDS[k]: vv[0] for k, vv in d.items()
                          if k in BOX_FIELDS}
        elif fn == 3 and wt == 0:
            out['type'] = v
        elif fn == 4:
            out['id'] = v.decode('utf-8', 'replace')
        elif fn == 7 and wt == 0:
            out['num_points'] = v
    return out


def parse_frame(rec):
    """Raw Frame bytes -> dict(context_name, timestamp, pose,
    cameras [{name, intrinsic, extrinsic, width, height}],
    labels [{box, type, id, num_points}], images {cam_name: bytes})."""
    out = dict(context_name='', timestamp=0, pose=np.eye(4),
               cameras=[], labels=[], images={})
    for fn, wt, v in fields(rec):
        if fn == 1:
            for cf, cw, cv in fields(v):
                if cf == 1 and cw == 2:
                    out['context_name'] = cv.decode('utf-8', 'replace')
                elif cf == 2:
                    out['cameras'].append(_camera_calibration(cv))
        elif fn == 2 and wt == 0:
            out['timestamp'] = v
        elif fn == 3:
            out['pose'] = _transform(v)
        elif fn == 4:
            name, img = 0, b''
            for gf, gw, gv in fields(v):
                if gf == 1 and gw == 0:
                    name = gv
                elif gf == 2:
                    img = gv
            out['images'][name] = img
        elif fn == 6:
            out['labels'].append(_label(v))
    return out


def camera_projection(cal):
    """KITTI-style P (4, 4) + Tr_velo_to_cam (4, 4) from a waymo
    camera calibration (reference waymo devkit conversion: waymo cam
    frame x-forward/y-left/z-up -> kitti cam z-forward/x-right/y-down
    via the fixed axis swap)."""
    fu, fv, cu, cv = cal['intrinsic'][:4]
    p = np.eye(4)
    p[0, 0], p[1, 1], p[0, 2], p[1, 2] = fu, fv, cu, cv
    # vehicle->cam (waymo axes) then waymo-cam -> kitti-cam axes
    v2c_waymo = np.linalg.inv(cal['extrinsic'])
    axes = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                     [1, 0, 0, 0], [0, 0, 0, 1]], np.float64)
    tr = axes @ v2c_waymo
    return p, tr
