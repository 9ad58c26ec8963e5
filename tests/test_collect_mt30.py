"""The mt30 random-policy collector (scripts/collect_mt30_random.py) writes
chunks the offline pipeline can consume: exact geometry (rows=ep_len+1,
bootstrap row with NaN action / 0 reward, per-episode task index, padded
obs/action dims) and Buffer bulk-loadability."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # subprocess collector run

REPO = Path(__file__).resolve().parent.parent


def test_collector_chunks_load_into_buffer(tmp_path):
    out = tmp_path / 'data'
    r = subprocess.run(
        [sys.executable, str(REPO / 'scripts' / 'collect_mt30_random.py'),
         '--episodes-per-task', '2', '--tasks', 'cartpole-balance',
         'pendulum-spin', '--out', str(out), '--chunk-eps', '3',
         '--seed', '3'],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    chunks = sorted(out.glob('chunk_*.npz'))
    assert len(chunks) == 2  # 4 episodes, 3 per chunk

    with np.load(chunks[0]) as z:
        obs, action, reward, task = (z['obs'], z['action'], z['reward'],
                                     z['task'])
    assert obs.shape[1:] == (501, 5) and obs.dtype == np.float32
    assert action.shape[1:] == (501, 1)
    assert reward.shape[1:] == (501,)
    # bootstrap row semantics: NaN action, zero reward at row 0
    assert np.isnan(action[:, 0]).all()
    assert (reward[:, 0] == 0).all()
    assert np.isfinite(action[:, 1:]).all()
    # task ids are mt30 indices (cartpole-balance=8, pendulum-spin is custom)
    from tdmpc2_tpu.config import TASK_SET
    names = [TASK_SET['mt30'][i] for i in task]
    assert set(names) <= {'cartpole-balance', 'pendulum-spin'}

    # bulk-load into a buffer with mt30-offline geometry and sample
    from tdmpc2_tpu.config import Config, parse_cfg
    from tdmpc2_tpu.data.buffer import Buffer
    cfg = parse_cfg(Config(task='mt30', batch_size=4, horizon=3))
    cfg.episode_length, cfg.buffer_size = 500, 100_000
    cfg.steps = cfg.buffer_size
    cfg.obs_shape = {'state': (5,)}
    cfg.action_dim = 1
    buf = Buffer(cfg)
    buf.reserve(4)
    for fp in chunks:
        with np.load(fp) as z:
            buf.load({k: z[k] for k in z.files})
    assert buf.num_eps == 4
    obs, act, rew, term, task_b = buf.sample()
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(act)).all()  # slices never hit the NaN row
    assert np.asarray(task_b).min() >= 0
