"""Tests for scripts/export_results.py — the publisher of training curves
into the reference results schema (step,reward,seed — cf.
/root/reference/results/tdmpc2/walker-walk.csv:1).

The --min-step guard exists because the exporter replaces rows per-seed:
a fresh re-run of an already-published task+seed would otherwise clobber a
longer committed curve with its first (short) export — which is exactly
what happened to the walker-walk pixel curve when a restarted run died at
step 0 (docs/RUNLOG_r4.md, queue C).
"""

import csv
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / 'scripts' / 'export_results.py'


def _write_eval(root, task, seed, exp, steps_rewards):
    d = root / 'logs' / task / seed / exp
    d.mkdir(parents=True, exist_ok=True)
    with open(d / 'eval.csv', 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=['step', 'episode_reward'])
        w.writeheader()
        for s, r in steps_rewards:
            w.writerow(dict(step=s, episode_reward=r))


def _run(root, *args):
    return subprocess.run([sys.executable, str(SCRIPT), *args],
                          cwd=root, capture_output=True, text=True)


def _rows(fp):
    with open(fp) as f:
        return [(int(r['step']), int(r['seed'])) for r in csv.DictReader(f)]


def test_export_merges_and_replaces_by_seed(tmp_path):
    _write_eval(tmp_path, 'walker-walk', '1', 'r1', [(0, 1.0), (50000, 2.0)])
    _write_eval(tmp_path, 'walker-walk', '2', 'r1', [(0, 1.5)])
    assert _run(tmp_path, 'walker-walk', '1', 'r1').returncode == 0
    assert _run(tmp_path, 'walker-walk', '2', 'r1').returncode == 0
    out = tmp_path / 'results' / 'tdmpc2_tpu' / 'walker-walk.csv'
    assert _rows(out) == [(0, 1), (50000, 1), (0, 2)]
    # re-export of seed 1 replaces only seed 1's rows
    _write_eval(tmp_path, 'walker-walk', '1', 'r1',
                [(0, 1.0), (50000, 2.0), (100000, 3.0)])
    assert _run(tmp_path, 'walker-walk', '1', 'r1').returncode == 0
    assert _rows(out) == [(0, 1), (50000, 1), (100000, 1), (0, 2)]


def test_min_step_refuses_short_curve_and_leaves_file_untouched(tmp_path):
    variant = 'tdmpc2_tpu-pixels'
    _write_eval(tmp_path, 'walker-walk', '1', 'old', [(0, 1.0), (350000, 9.0)])
    assert _run(tmp_path, 'walker-walk', '1', 'old', variant).returncode == 0
    out = tmp_path / 'results' / variant / 'walker-walk.csv'
    committed = _rows(out)
    # a fresh run that has only reached 50k must NOT clobber the 350k curve
    _write_eval(tmp_path, 'walker-walk', '1', 'fresh', [(0, 0.5), (50000, 2.0)])
    res = _run(tmp_path, 'walker-walk', '1', 'fresh', variant,
               '--min-step', '400000')
    assert res.returncode != 0 and 'not exporting' in res.stderr
    assert _rows(out) == committed
    # once the fresh run passes the bar, it replaces the old seed-1 rows
    _write_eval(tmp_path, 'walker-walk', '1', 'fresh',
                [(0, 0.5), (50000, 2.0), (400000, 9.5)])
    assert _run(tmp_path, 'walker-walk', '1', 'fresh', variant,
                '--min-step', '400000').returncode == 0
    assert _rows(out) == [(0, 1), (50000, 1), (400000, 1)]
