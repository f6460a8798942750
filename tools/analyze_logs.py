"""Training-log analysis.

Equivalent of /root/reference/tools/analysis_tools/analyze_logs.py:
plot loss curves and compute average iteration time from the jsonl logs
written by tools/train*.py.

Usage:
    python tools/analyze_logs.py plot_curve work_dirs/run/train_log.jsonl \
        --keys loss --out curves.png
    python tools/analyze_logs.py cal_train_time work_dirs/run/train_log.jsonl
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_log(path):
    rows = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                rows.append(json.loads(ln))
    return rows


def plot_curve(args):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for path in args.logs:
        rows = load_log(path)
        for key in args.keys:
            xs = [r['step'] for r in rows if key in r]
            ys = [r[key] for r in rows if key in r]
            plt.plot(xs, ys, label=f'{os.path.basename(path)}:{key}')
    plt.xlabel('step')
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(args.out, dpi=120, bbox_inches='tight')
    print(f'saved {args.out}')


def cal_train_time(args):
    for path in args.logs:
        rows = [r for r in load_log(path) if 'scenes_per_sec' in r]
        if not rows:
            print(f'{path}: no throughput entries')
            continue
        sps = [r['scenes_per_sec'] for r in rows]
        import numpy as np
        print(f'{path}: mean {np.mean(sps):.2f} scenes/s, '
              f'median {np.median(sps):.2f}, '
              f'max {np.max(sps):.2f} over {len(sps)} intervals')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('plot_curve')
    pc.add_argument('logs', nargs='+')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default='curves.png')
    ct = sub.add_parser('cal_train_time')
    ct.add_argument('logs', nargs='+')
    args = p.parse_args()
    dict(plot_curve=plot_curve, cal_train_time=cal_train_time)[args.task](
        args)


if __name__ == '__main__':
    main()
