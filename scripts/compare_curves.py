#!/usr/bin/env python
"""Compare our eval curves against the reference's published results.

Usage: python scripts/compare_curves.py <task> [seed] [exp_name]

Reads logs/<task>/<seed>/<exp>/eval.csv (ours) and
/root/reference/results/tdmpc2/<task>.csv (3-seed reference curves,
schema step,{reward|success},seed) and prints both at matching steps.
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict
from pathlib import Path

REFERENCE_RESULTS = Path('/root/reference/results/tdmpc2')


def load_ours(task, seed, exp):
    fp = Path('logs') / task / str(seed) / exp / 'eval.csv'
    if not fp.exists():
        sys.exit(f'No local curve at {fp}')
    with open(fp) as f:
        return [(int(r['step']), float(r['episode_reward']))
                for r in csv.DictReader(f)]


def load_reference(task):
    fp = REFERENCE_RESULTS / f'{task}.csv'
    if not fp.exists():
        return None
    by_step = defaultdict(list)
    with open(fp) as f:
        for r in csv.DictReader(f):
            val = r.get('reward', r.get('success'))
            by_step[int(float(r['step']))].append(float(val))
    return {s: sum(v) / len(v) for s, v in sorted(by_step.items())}


def main():
    task = sys.argv[1]
    seed = sys.argv[2] if len(sys.argv) > 2 else '1'
    exp = sys.argv[3] if len(sys.argv) > 3 else 'r1'
    ours = load_ours(task, seed, exp)
    ref = load_reference(task)
    print(f'{"step":>10} {"ours":>10} {"reference(3-seed mean)":>24}')
    for step, r in ours:
        ref_r = ''
        if ref:
            nearest = min(ref, key=lambda s: abs(s - step))
            if abs(nearest - step) <= max(25_000, step * 0.1):
                ref_r = f'{ref[nearest]:.1f} @{nearest}'
        print(f'{step:>10,} {r:>10.1f} {ref_r:>24}')


if __name__ == '__main__':
    main()
