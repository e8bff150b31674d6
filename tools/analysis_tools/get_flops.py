#!/usr/bin/env python
"""Model FLOPs/memory report via XLA's compiled cost analysis
(equivalent of the reference's tools/analysis_tools/get_flops.py, but
exact: numbers come from the compiled HLO, not a per-module counter).

Usage: python tools/analysis_tools/get_flops.py [--shape 320 1280]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--shape', type=int, nargs=2, default=[320, 1280])
    p.add_argument('--cpu', action='store_true',
                   help='analyze the CPU lowering (no TPU needed)')
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import __graft_entry__ as ge

    fn, fargs = ge.entry()
    lowered = jax.jit(fn).lower(*fargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get('flops', float('nan'))
    bytes_ = cost.get('bytes accessed', float('nan'))
    print(f'flops: {flops:.3e}')
    print(f'bytes accessed: {bytes_:.3e}')
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f'argument bytes: {mem.argument_size_in_bytes:.3e}')
        print(f'temp bytes: {mem.temp_size_in_bytes:.3e}')


if __name__ == '__main__':
    main()
