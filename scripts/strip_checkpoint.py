#!/usr/bin/env python
"""Strip a full training checkpoint to a small committable policy artifact.

Full checkpoints (params + target Qs + two Adam states + scale + key,
tdmpc2_tpu/tdmpc2.py `save`) are ~4x model size and live in gitignored
logs/ — they die with every container reset. This script keeps only what's
needed to ACT and EVALUATE (model params + target Qs + arch metadata), cast
to bfloat16 and gzipped, so trained policies can be committed under
results/checkpoints/ and reused later (evaluation, mt30 medium-quality data
collection via scripts/collect_mt30_medium.py) regardless of resets.

The output loads through the normal `TDMPC2.load` path (gzip-sniffed;
optimizer state is optional on load).

Usage:
    python scripts/strip_checkpoint.py logs/<task>/<seed>/<exp>/models/latest.pkl \
        [-o results/checkpoints/<task>-s<seed>.pkl.gz]
    python scripts/strip_checkpoint.py --all <exp> [<exp2> ...]   # sweep logs/
"""

from __future__ import annotations

import argparse
import gzip
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_bf16(x):
    x = np.asarray(x)
    if x.dtype == np.float32:
        import ml_dtypes
        return x.astype(ml_dtypes.bfloat16)
    return x


def strip(src: Path, dst: Path) -> Path:
    import jax
    with open(src, 'rb') as f:
        blob = pickle.load(f)
    out = {'model': jax.tree.map(_to_bf16, blob['model'])}
    if 'target_Qs' in blob:
        out['target_Qs'] = jax.tree.map(_to_bf16, blob['target_Qs'])
    if 'arch' in blob:
        out['arch'] = blob['arch']
    if 'extra' in blob:
        out['extra'] = blob['extra']
    dst.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(dst, 'wb', compresslevel=6) as f:
        pickle.dump(out, f)
    print(f'{src} ({src.stat().st_size/2**20:.1f} MB) -> '
          f'{dst} ({dst.stat().st_size/2**20:.1f} MB)')
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('src', nargs='?', help='checkpoint to strip')
    ap.add_argument('-o', '--out', default=None)
    ap.add_argument('--all', nargs='*', metavar='EXP', default=None,
                    help='strip every logs/<task>/<seed>/<EXP>/models/'
                         'latest.pkl into results/checkpoints/')
    args = ap.parse_args()

    if args.all is not None:
        exps = set(args.all)
        n = 0
        for src in sorted(Path('logs').glob('*/*/*/models/latest.pkl')):
            task, seed, exp = src.parts[1], src.parts[2], src.parts[3]
            if exps and exp not in exps:
                continue
            strip(src, Path('results/checkpoints') / f'{task}-s{seed}.pkl.gz')
            n += 1
        print(f'stripped {n} checkpoints')
        return
    if not args.src:
        ap.error('need a checkpoint path or --all')
    src = Path(args.src)
    if args.out:
        dst = Path(args.out)
    else:
        task, seed = src.parts[-5], src.parts[-4]
        dst = Path('results/checkpoints') / f'{task}-s{seed}.pkl.gz'
    strip(src, dst)


if __name__ == '__main__':
    main()
