#!/usr/bin/env python
"""Analyze training logs (equivalent of the reference's
tools/analysis_tools/analyze_logs.py over mmcv .log.json files, here
over the metrics.jsonl written by dfm_tpu.runtime.logging).

Usage:
  python tools/analysis_tools/analyze_logs.py cal_train_time m.jsonl
  python tools/analysis_tools/analyze_logs.py plot_curve m.jsonl \
      --keys train/loss --out curve.png
"""

import argparse
import json


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def cal_train_time(recs):
    ts = [r['train/s_per_iter'] for r in recs if 'train/s_per_iter' in r]
    if not ts:
        print('no timing records')
        return
    import statistics
    print(f'iters logged: {len(ts)}')
    print(f'average: {statistics.mean(ts):.4f} s/iter')
    print(f'fastest: {min(ts):.4f} s/iter  slowest: {max(ts):.4f} s/iter')


def plot_curve(recs, keys, out=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for key in keys:
        xs = [r['step'] for r in recs if key in r]
        ys = [r[key] for r in recs if key in r]
        plt.plot(xs, ys, label=key)
    plt.xlabel('step')
    plt.legend()
    if out:
        plt.savefig(out, dpi=120)
        print(f'saved {out}')
    else:
        for key in keys:
            ys = [r[key] for r in recs if key in r]
            print(f'{key}: first={ys[0]:.4f} last={ys[-1]:.4f} '
                  f'min={min(ys):.4f}' if ys else f'{key}: no records')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('task', choices=['cal_train_time', 'plot_curve'])
    p.add_argument('jsonl')
    p.add_argument('--keys', nargs='+', default=['train/loss'])
    p.add_argument('--out', default=None)
    args = p.parse_args()
    recs = load(args.jsonl)
    if args.task == 'cal_train_time':
        cal_train_time(recs)
    else:
        plot_curve(recs, args.keys, args.out)


if __name__ == '__main__':
    main()
