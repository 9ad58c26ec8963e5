#!/usr/bin/env python
"""Regenerate docs/RESULTS.md from results/ (state + pixels + mt30).

One command at the end of a chip day: per-task/per-seed comparison tables
against the reference's published curves (scripts/summarize_results.py) plus
the multitask offline table.

Usage: python scripts/gen_results_doc.py
"""

from __future__ import annotations

import csv
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import summarize_results  # noqa: E402  (scripts/ sibling)


def table(variant):
    buf = io.StringIO()
    argv = sys.argv
    sys.argv = ['summarize_results.py', variant]
    try:
        with redirect_stdout(buf):
            summarize_results.main()
    finally:
        sys.argv = argv
    return buf.getvalue()


# Per-task commentary that must survive regeneration. Keep each note tied
# to the specific committed curve it explains; drop it when the curve is
# superseded.
NOTES = [
    ('finger-spin seed 3 @400k = 944.5 (the one committed point below the '
     'reference band): a final-eval dip, not a learning failure — the same '
     'seed logged 980.2 @350k and oscillated 951.9-980.8 all run, and the '
     'reference\'s own seeds oscillate similarly (its seed 3 logs 977.8 '
     '@700k between 987-per-point neighbors). 10-episode eval variance on '
     'a spin task; a continuation run would settle it.'),
    ('cheetah-run seed 1 @1M = 790.2 vs reference mean 844.4: within the '
     'reference\'s own seed spread at 1M (725-911). Seeds 2,3 were queued '
     'twice in round 5 and lost their slots to the chip-day incidents '
     '(container reset, three tunnel RPC stalls) — the r5i tail spent the '
     'last window on the walker-flip custom-task proof instead. Still a '
     'single-seed point; flagged.'),
    ('cartpole-balance stops at 120k vs the BASELINE "~975 @1M" gate: the '
     'task converges by ~100k and the reference\'s own @1M mean (974.7) is '
     'BELOW all three of our @120k values (989.2/991.6/999.3) — extending '
     'the x-axis cannot change the comparison, so the chip hours went to '
     'unconverged tasks instead (explicit descope, r4+r5).'),
    ('hopper-hop seed 1 is the first long-horizon curve (past 1.3M, r5): '
     '557.5 @1.3M, 597.4 @1.35M, 599.5 @1.4M, 597.8 @1.45M — above the '
     'reference\'s FINAL @4M (449.2) continuously from 250k on (its mean '
     '@1M is ~210). Trained at ~350 env-steps/s (nv=24) across four chip '
     'slots spanning two tunnel RPC stalls; both resumes restored the '
     '200-episode replay snapshot (100k steps of refill credit) and '
     'continued with no post-resume dip. Resumable artifact: '
     'results/checkpoints/full/hopper-hop-s1-r5.pkl.gz.'),
    ('walker-flip (custom task, envs/tasks/locomotion.py — reference '
     'rewards tdmpc2/envs/tasks/walker.py): 3-seed fleet proof that the '
     'custom-task layer trains; the reference publishes no curves for its '
     'custom tasks, so the claim is "it learns", not parity.'),
]

PIXEL_NOTES = [
    ('walker-walk rgb is the BASELINE.md key pixel gate (>=939.6 @1M): '
     'passed at 964.2 @1M (above even the reference\'s 2M final, 949.2) '
     'on 2026-08-20 — one coherent seed-1 run, 0 -> 1M. The curve carries '
     'two honest infrastructure artifacts, not learning failures: dips at '
     '350k/450k (container-reset resume at 250k: TD updates over the '
     'narrow all-expert refill buffer corrupt Q exactly where MPPI '
     'searches; the policy re-diversifies its own buffer and recovers '
     'within ~75k steps) and at 850k/900k (the same dynamics after an '
     'RPC-stall restart from 700k; recovered 62.7 -> 964.2 over 150k '
     'steps). Between dips the run held 950-966 from 500k onward. Steps '
     '250k -> 1M ran update_ratio=0.5 (same env-step budget as the '
     'reference, HALF the gradient updates — docs/PERFORMANCE.md) at '
     '~80-88 env-steps/s sustained on the tunneled chip. Replay-tail '
     'snapshots (post-6558d3f) now make further resumes data-backed; '
     'this run\'s dips predate the working snapshot path.'),
]

MT30_NOTES = [
    ('The r5 medium-data 19M run does NOT separate from the random-data '
     'baseline at this budget: 17.6 vs 17.9 normalized at 40k iters — '
     'within the ±1-1.5 noise of a 2-episode/task eval. Plausible cause: '
     'the medium set upgrades only the ~5 task families with trained '
     'checkpoints behind it (the other ~25 stay noise/random in both '
     'datasets), and 40k iterations over a ~200k-transition set (~50 '
     'epochs) is the fitting, not data, limit. Recorded as a negative '
     'result.'),
    ('The 317M run is the VERDICT-r4 ask made concrete: the flagship-size '
     'agent TRAINS end to end on this stack (10k iterations, losses '
     'logged, two eval points) — turning the r4 "20.6 updates/s step '
     'benchmark" into an actual training run. It is NOT a quality claim: '
     '10k iterations on a ~200k-transition self-collected set leaves a '
     '317M model undertrained (13.2-15.0 normalized, at/below its step-0 '
     'planner prior), exactly as expected at ~1/2000 of the reference\'s '
     'data scale.'),
]


def notes_section(notes=None):
    notes = NOTES if notes is None else notes
    if not notes:
        return ''
    out = ['### Notes', '']
    out += [f'- {n}' for n in notes]
    return '\n'.join(out) + '\n'


def mt30_section():
    files = [
        (Path('results/tdmpc2_tpu/mt30-random-19m.csv'),
         '19M, random data', 0),
        (Path('results/tdmpc2_tpu/mt30-medium-19m.csv'),
         '19M, medium data', 1),
        (Path('results/tdmpc2_tpu/mt30-medium-48m.csv'),
         '48M, medium data', 2),
        (Path('results/tdmpc2_tpu/mt30-medium-317m.csv'),
         '317M, medium data', 3),
    ]
    rows = []
    for fp, label, order in files:
        if not fp.exists():
            continue
        with open(fp) as f:
            for r in csv.DictReader(f):
                rows.append((order, label, int(float(r['step'])),
                             float(r['reward'])))
    if not rows:
        return ''
    out = ['## mt30 offline (30-task multitask)', '',
           'Datasets are self-collected (zero egress here): "random" is a',
           'random-policy pipeline-validation set (round 3); "medium" mixes',
           'rollouts of this repo\'s own trained checkpoints with a noise',
           'schedule + random fill (scripts/collect_mt30_medium.py). NOT',
           'comparable to the reference\'s mt30 results, which train on its',
           'unreachable 345.69M-transition dataset (reference',
           'trainer/offline_trainer.py:53-55) — the claim here is score',
           'separation from random data and scaling with model size.',
           'Normalized score = mean return / 10 (all 30 tasks are DMControl,',
           'reference evaluate.py:93-99).', '',
           '| model / data | step | mean return | normalized score |',
           '|---|---|---|---|']
    for order, label, step, val in sorted(rows):
        out.append(f'| {label} | {step:,} | {val:.1f} | {val / 10:.1f} |')
    return '\n'.join(out) + '\n'


def main():
    os.chdir(Path(__file__).resolve().parent.parent)
    sys.path.insert(0, 'scripts')
    parts = [
        '# Results vs the reference\'s published curves', '',
        'Generated by `python scripts/gen_results_doc.py`. Per-seed final',
        'return at our last logged step vs the reference 3-seed mean at the',
        'closest step (and its own final), plus curve dominance: the share',
        'of our logged evals (past 10% burn-in) at/above the reference mean',
        'at that step. Reference curves: /root/reference/results/.', '',
        '## State observations (results/tdmpc2_tpu vs results/tdmpc2)', '',
        table('tdmpc2_tpu'), '',
        notes_section(), '',
        '## Pixels (results/tdmpc2_tpu-pixels vs results/tdmpc2-pixels)', '',
        table('tdmpc2_tpu-pixels'), '',
        notes_section(PIXEL_NOTES), '',
        mt30_section(), '',
        notes_section(MT30_NOTES),
    ]
    Path('docs/RESULTS.md').write_text('\n'.join(parts))
    print('wrote docs/RESULTS.md')


if __name__ == '__main__':
    main()
