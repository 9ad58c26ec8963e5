#!/usr/bin/env python
"""Summarize results/ vs the reference's published curves as a markdown
table (for README / status docs).

For every task CSV under results/<variant>/, prints per-seed final return at
the last logged step, alongside the reference mean (over its 3 seeds) at the
closest logged step <= ours and at the reference's own final step, plus
curve dominance: at how many of our logged eval steps (past the 10%
burn-in) we are at or above the reference mean at that step — a single
final-point comparison misrepresents curves that lead throughout but
fluctuate at the last eval (eval returns are 10-episode means; the
reference's own curves fluctuate comparably between adjacent evals).

Usage: python scripts/summarize_results.py [variant] [ref_variant]
  variant:     results subdirectory (default tdmpc2_tpu)
  ref_variant: reference results subdirectory (default matches:
               tdmpc2_tpu -> tdmpc2, tdmpc2_tpu-pixels -> tdmpc2-pixels)
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict
from pathlib import Path

REF_ROOT = Path('/root/reference/results')


def _by_seed(fp):
    curves = defaultdict(list)
    with open(fp) as f:
        for r in csv.DictReader(f):
            val = r.get('reward') or r.get('success')
            curves[r['seed']].append((int(float(r['step'])), float(val)))
    for c in curves.values():
        c.sort()
    return curves


def _ref_mean_at(curves, step):
    """Mean over reference seeds at the largest logged step <= `step`."""
    vals, at = [], None
    for c in curves.values():
        pts = [(s, v) for s, v in c if s <= step]
        if pts:
            vals.append(pts[-1][1])
            at = pts[-1][0] if at is None else max(at, pts[-1][0])
    return (sum(vals) / len(vals), at) if vals else (float('nan'), None)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'tdmpc2_tpu'
    default_ref = {'tdmpc2_tpu': 'tdmpc2',
                   'tdmpc2_tpu-pixels': 'tdmpc2-pixels'}.get(variant, 'tdmpc2')
    ref_variant = sys.argv[2] if len(sys.argv) > 2 else default_ref

    out_dir = Path('results') / variant
    if not out_dir.is_dir():
        sys.exit(f'no {out_dir}')
    print('| task | seed | ours @step | ref mean @<=step | ref final '
          '| ours>=ref |')
    print('|---|---|---|---|---|---|')
    for fp in sorted(out_dir.glob('*.csv')):
        task = fp.stem
        if task.startswith('mt30') or task.startswith('mt80'):
            continue  # offline multitask curves get their own doc section
        ours = _by_seed(fp)
        ref_fp = REF_ROOT / ref_variant / f'{task}.csv'
        ref = _by_seed(ref_fp) if ref_fp.exists() else {}
        for seed in sorted(ours, key=int):
            step, val = ours[seed][-1]
            if ref:
                rmean, rat = _ref_mean_at(ref, step)
                rfinal_step = max(c[-1][0] for c in ref.values())
                rfinal, _ = _ref_mean_at(ref, rfinal_step)
                # curve dominance past the 10% burn-in
                wins = total = 0
                for s, v in ours[seed]:
                    if s < 0.1 * step:
                        continue
                    rm, _at = _ref_mean_at(ref, s)
                    if _at is None:
                        continue
                    total += 1
                    wins += v >= rm
                dom = f'{wins}/{total}' if total else '—'
                print(f'| {task} | {seed} | {val:.1f} @{step:,} '
                      f'| {rmean:.1f} @{rat:,} | {rfinal:.1f} '
                      f'@{rfinal_step:,} | {dom} |')
            else:
                print(f'| {task} | {seed} | {val:.1f} @{step:,} '
                      f'| (no reference) | — | — |')


if __name__ == '__main__':
    main()
