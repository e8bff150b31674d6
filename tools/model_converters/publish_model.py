"""Strip a training checkpoint for release.

Equivalent of the reference's `tools/model_converters/publish_model.py`
(drop optimizer state, append a content hash to the filename). Works
on orbax checkpoint dirs (runtime/checkpoint.py layout) and on plain
msgpack files.

Usage: python tools/model_converters/publish_model.py SRC DST
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args()

    from flax.serialization import msgpack_restore, msgpack_serialize

    if os.path.isdir(args.src):
        from dfm_tpu.runtime.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.src)
        step = mgr.latest_step()
        if step is None:
            raise SystemExit(f'no checkpoints under {args.src}')
        state = mgr.restore(step)
        tree = {k: v for k, v in state.items()
                if k in ('params', 'batch_stats')}
    else:
        with open(args.src, 'rb') as f:
            tree = msgpack_restore(f.read())
        tree.pop('opt_state', None)

    blob = msgpack_serialize(tree)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    root, ext = os.path.splitext(args.dst)
    out = f'{root}-{sha}{ext or ".msgpack"}'
    with open(out, 'wb') as f:
        f.write(blob)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
