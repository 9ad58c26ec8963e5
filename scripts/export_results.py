#!/usr/bin/env python
"""Export local eval curves to results/ in the published CSV schema
(step,reward,seed — reference results/tdmpc2/*.csv).

Usage: python scripts/export_results.py <task> [seed] [exp_name] [variant]
           [--min-step N]

`variant` (default 'tdmpc2_tpu') selects the results subdirectory, e.g.
'tdmpc2_tpu-pixels' for rgb runs (mirrors the reference's
results/tdmpc2-pixels/ layout).

`--min-step N` refuses to export until the source curve reaches step N —
used when a fresh run restarts a task+seed whose previous (longer) curve
is already committed, so a short re-run can't clobber better evidence
(the exporter replaces rows per-seed).
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path


def main():
    argv = list(sys.argv[1:])
    min_step = 0
    if '--min-step' in argv:
        i = argv.index('--min-step')
        min_step = int(argv[i + 1])
        del argv[i:i + 2]
    task = argv[0]
    seed = argv[1] if len(argv) > 1 else '1'
    exp = argv[2] if len(argv) > 2 else 'r1'
    variant = argv[3] if len(argv) > 3 else 'tdmpc2_tpu'
    src = Path('logs') / task / seed / exp / 'eval.csv'
    if not src.exists():
        sys.exit(f'No curve at {src}')
    if min_step:
        with open(src) as f:
            steps = [int(r['step']) for r in csv.DictReader(f)]
        if not steps or max(steps) < min_step:
            sys.exit(f'{src} max step {max(steps) if steps else 0} '
                     f'< --min-step {min_step}; not exporting')
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
