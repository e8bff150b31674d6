"""Minimal XSpace (xplane.pb) parser: per-op device-time table.

The dev image's tensorboard_plugin_profile cannot convert xplane files
(its native converter targets a different TF build), so this decodes
the protobuf wire format directly (same approach as
dfm_tpu/evaluation/waymo_proto.py) and aggregates XEvent durations by
op (XEventMetadata) name on the TPU device planes.

Usage: python tools/parse_xplane.py <trace_dir_or_xplane.pb> [top_n]
"""

import glob
import os
import sys


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
    """Yield (field_number, wire_type, value) over a message buffer."""
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


def parse_plane(buf):
    name = b''
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v
        elif fn == 3:
            lines.append(v)
        elif fn == 4:
            # map<int64, XEventMetadata>: entry {1: key, 2: value}
            k = None
            m = None
            for fn2, _, v2 in fields(v):
                if fn2 == 1:
                    k = v2
                elif fn2 == 2:
                    m = v2
            if m is not None:
                mname = b''
                mid = k
                for fn3, _, v3 in fields(m):
                    if fn3 == 1:
                        mid = v3
                    elif fn3 == 2:
                        mname = v3
                meta[mid] = mname.decode('utf-8', 'replace')
    return name.decode('utf-8', 'replace'), lines, meta


def op_table(path):
    buf = open(path, 'rb').read()
    table = {}
    for fn, wt, plane in fields(buf):
        if fn != 1:
            continue
        pname, lines, meta = parse_plane(plane)
        if not pname.startswith('/device:TPU'):
            continue
        for line in lines:
            for fn2, _, v2 in fields(line):
                if fn2 != 4:
                    continue
                mid = dur = 0
                for fn3, _, v3 in fields(v2):
                    if fn3 == 1:
                        mid = v3
                    elif fn3 == 3:
                        dur = v3
                name = meta.get(mid, str(mid))
                t, c = table.get(name, (0, 0))
                table[name] = (t + dur, c + 1)
    return table


def main():
    arg = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if os.path.isdir(arg):
        files = glob.glob(arg + '/**/*.xplane.pb', recursive=True)
        arg = sorted(files)[-1]
    table = op_table(arg)
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])
    total = sum(t for t, _ in table.values())
    print(f'total device time: {total / 1e9:.3f} ms '
          f'(all runs; {arg})')
    for name, (t, c) in rows[:top]:
        print(f'{t / 1e9:9.3f} ms  x{c:4d}  {name[:110]}')


if __name__ == '__main__':
    main()
