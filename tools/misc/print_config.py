#!/usr/bin/env python
"""Print the fully-merged config (reference tools/misc/print_config.py).

Usage: python tools/misc/print_config.py configs/x.py [--cfg-options ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from dfm_tpu.runtime.config import load_config, merge_options  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()
    cfg = merge_options(load_config(args.config), args.cfg_options)
    import json
    print(json.dumps(cfg.to_dict(), indent=2, default=str))


if __name__ == '__main__':
    main()
