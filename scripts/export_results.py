#!/usr/bin/env python
"""Export local eval curves to results/ in the published CSV schema
(step,reward,seed — reference results/tdmpc2/*.csv).

Usage: python scripts/export_results.py <task> [seed] [exp_name] [variant]

`variant` (default 'tdmpc2_tpu') selects the results subdirectory, e.g.
'tdmpc2_tpu-pixels' for rgb runs (mirrors the reference's
results/tdmpc2-pixels/ layout).
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path


def main():
    task = sys.argv[1]
    seed = sys.argv[2] if len(sys.argv) > 2 else '1'
    exp = sys.argv[3] if len(sys.argv) > 3 else 'r1'
    variant = sys.argv[4] if len(sys.argv) > 4 else 'tdmpc2_tpu'
    src = Path('logs') / task / seed / exp / 'eval.csv'
    if not src.exists():
        sys.exit(f'No curve at {src}')
    out_dir = Path('results') / variant
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f'{task}.csv'
    rows = []
    if out.exists():
        with open(out) as f:
            rows = [r for r in csv.DictReader(f) if r['seed'] != seed]
    with open(src) as f:
        for r in csv.DictReader(f):
            rows.append(dict(step=r['step'], reward=r['episode_reward'],
                             seed=seed))
    rows.sort(key=lambda r: (int(r['seed']), int(r['step'])))
    with open(out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
        w.writeheader()
        w.writerows(rows)
    print(f'{src} -> {out} ({len(rows)} rows)')


if __name__ == '__main__':
    main()
