"""Minimal protobuf wire codec for Waymo detection-metrics protos.

The official evaluation exchanges serialized `Objects` messages
(waymo-open-dataset metrics.proto / label.proto). The devkit is not a
dependency of this framework, so the three message types needed for
prediction/GT bins are encoded/decoded here directly at the wire level.
Field numbers follow the public waymo-open-dataset schema and were
verified against the reference's checked-in fixture
(/root/reference/tests/data/waymo/waymo_format/gt.bin decodes and
round-trips byte-identically):

    Objects { repeated Object objects = 1; }
    Object  { Label object = 1; float score = 2;
              string context_name = 4?/3?;  int64 frame_timestamp_micros;
              (observed: context_name = 4, frame_timestamp_micros = 5) }
    Label   { Box box = 1; Type type = 3;
              int32 num_lidar_points_in_box = 7;
              string most_visible_camera_name = 11;
              Box camera_synced_box = 12; }
    (The LET binary evaluates against camera_synced_box and drops GT
    lacking most_visible_camera_name — verified empirically: a perfect
    prediction scores LET-mAP 0 without fields 11+12 and 1 with them.)
    Label.Box { double center_x=1, center_y=2, center_z=3,
                width=4, length=5, height=6, heading=7; }

Reference flow being replaced: KITTI2Waymo writes these protos via the
devkit (core/evaluation/waymo_utils/prediction_kitti_to_waymo.py:162-186)
and WaymoDataset.evaluate shells out to the metrics binary
(datasets/waymo_dataset.py:601-603).
"""

import struct
from dataclasses import dataclass, field
from typing import List, Optional

__all__ = ['Box', 'ObjectPred', 'encode_objects', 'decode_objects',
           'TYPE_VEHICLE', 'TYPE_PEDESTRIAN', 'TYPE_SIGN', 'TYPE_CYCLIST',
           'KITTI_NAME_TO_TYPE']

TYPE_UNKNOWN = 0
TYPE_VEHICLE = 1
TYPE_PEDESTRIAN = 2
TYPE_SIGN = 3
TYPE_CYCLIST = 4

KITTI_NAME_TO_TYPE = {'Car': TYPE_VEHICLE, 'Pedestrian': TYPE_PEDESTRIAN,
                      'Sign': TYPE_SIGN, 'Cyclist': TYPE_CYCLIST}


@dataclass
class Box:
    center_x: float = 0.0
    center_y: float = 0.0
    center_z: float = 0.0
    width: float = 0.0
    length: float = 0.0
    height: float = 0.0
    heading: float = 0.0


@dataclass
class ObjectPred:
    box: Box = field(default_factory=Box)
    type: int = TYPE_UNKNOWN
    score: Optional[float] = None
    context_name: str = ''
    frame_timestamp_micros: int = 0
    num_lidar_points_in_box: Optional[int] = None
    most_visible_camera_name: str = ''
    camera_synced_box: Optional[Box] = None


def _varint(v):
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(f, wt):
    return _varint((f << 3) | wt)


def _len_field(f, payload):
    return _tag(f, 2) + _varint(len(payload)) + payload


def _encode_box(b: Box) -> bytes:
    out = bytearray()
    for i, v in enumerate((b.center_x, b.center_y, b.center_z, b.width,
                           b.length, b.height, b.heading), start=1):
        out += _tag(i, 1) + struct.pack('<d', float(v))
    return bytes(out)


def _encode_label(o: ObjectPred) -> bytes:
    out = bytearray()
    out += _len_field(1, _encode_box(o.box))
    out += _tag(3, 0) + _varint(o.type)
    if o.num_lidar_points_in_box is not None:
        out += _tag(7, 0) + _varint(o.num_lidar_points_in_box)
    if o.most_visible_camera_name:
        out += _len_field(11, o.most_visible_camera_name.encode())
    if o.camera_synced_box is not None:
        out += _len_field(12, _encode_box(o.camera_synced_box))
    return bytes(out)


def _encode_object(o: ObjectPred) -> bytes:
    out = bytearray()
    out += _len_field(1, _encode_label(o))
    if o.score is not None:
        out += _tag(2, 5) + struct.pack('<f', float(o.score))
    if o.context_name:
        out += _len_field(4, o.context_name.encode())
    out += _tag(5, 0) + _varint(o.frame_timestamp_micros)
    return bytes(out)


def encode_objects(objs: List[ObjectPred]) -> bytes:
    out = bytearray()
    for o in objs:
        out += _len_field(1, _encode_object(o))
    return bytes(out)


def _read_varint(b, i):
    r = 0
    s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _scan(b):
    i = 0
    while i < len(b):
        key, i = _read_varint(b, i)
        f, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 1:
            v = struct.unpack('<d', b[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack('<f', b[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f'unsupported wire type {wt}')
        yield f, wt, v


def _decode_box(b) -> Box:
    box = Box()
    names = {1: 'center_x', 2: 'center_y', 3: 'center_z', 4: 'width',
             5: 'length', 6: 'height', 7: 'heading'}
    for f, wt, v in _scan(b):
        if f in names:
            setattr(box, names[f], v)
    return box


def decode_objects(data: bytes) -> List[ObjectPred]:
    out = []
    for f, wt, payload in _scan(data):
        if f != 1:
            continue
        o = ObjectPred()
        for f2, wt2, v2 in _scan(payload):
            if f2 == 1:              # Label
                for f3, wt3, v3 in _scan(v2):
                    if f3 == 1:
                        o.box = _decode_box(v3)
                    elif f3 == 3:
                        o.type = v3
                    elif f3 == 7:
                        o.num_lidar_points_in_box = v3
                    elif f3 == 11:
                        o.most_visible_camera_name = v3.decode()
                    elif f3 == 12:
                        o.camera_synced_box = _decode_box(v3)
            elif f2 == 2:
                o.score = v2
            elif f2 == 4:
                o.context_name = v2.decode()
            elif f2 == 5:
                o.frame_timestamp_micros = v2
        out.append(o)
    return out
