#!/usr/bin/env python
"""Convert published TensorDict .pt dataset chunks to native .npz chunks.

Usage: python datasets/convert_pt_to_npz.py <pt_dir> <npz_dir>

Requires torch only — tensordict is NOT needed: the published chunks are
unpickled with stub container classes and their tensors recovered from the
object graph (tdmpc2_tpu/utils/torch_interop.py; reference dataset layout:
tdmpc2/trainer/offline_trainer.py:42-65). The resulting .npz chunks load
without torch.
"""

from __future__ import annotations

import sys
from glob import glob
from pathlib import Path

import numpy as np


def convert_chunk(fp: str, out_dir: Path) -> Path:
    from tdmpc2_tpu.utils.torch_interop import read_tensordict_chunk
    arrays = read_tensordict_chunk(fp)
    out = out_dir / (Path(fp).stem + '.npz')
    np.savez_compressed(out, **arrays)
    n, rows = arrays['reward'].shape[:2]
    print(f'{fp} -> {out}  ({n} episodes x {rows} rows)')
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    pt_dir, npz_dir = sys.argv[1], Path(sys.argv[2])
    npz_dir.mkdir(parents=True, exist_ok=True)
    fps = sorted(glob(str(Path(pt_dir) / '*.pt')))
    if not fps:
        sys.exit(f'No .pt chunks found in {pt_dir}')
    for fp in fps:
        convert_chunk(fp, npz_dir)


if __name__ == '__main__':
    main()
