"""bench.py CI smoke: the driver runs `python bench.py` at end of round and
parses exactly one JSON line from stdout — this test runs the full script
(CPU, reduced sizes via BENCH_QUICK) and pins the output contract."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full bench script run

ROOT = Path(__file__).resolve().parents[1]


def test_bench_json_contract():
    env = dict(os.environ, BENCH_CPU='1', BENCH_QUICK='1')
    env['PYTHONPATH'] = str(ROOT) + os.pathsep + env.get('PYTHONPATH', '')
    env.pop('XLA_FLAGS', None)  # single CPU device, not the virtual mesh
    out = subprocess.run(
        [sys.executable, str(ROOT / 'bench.py')], capture_output=True,
        text=True, env=env, cwd=str(ROOT), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ('metric', 'value', 'unit', 'vs_baseline'):
        assert key in rec, rec
    assert rec['metric'] == 'planner_plans_per_s'
    assert rec['value'] > 0
    # self-diagnosis extras: per-call + RTT so degraded-tunnel captures
    # are identifiable in the committed BENCH_r*.json
    assert rec['per_call_plans_per_s'] > 0
    assert rec['dispatch_us'] > 0
    assert rec['update_steps_per_s'] > 0
