"""Offline multi-task pipeline: dataset chunks -> buffer -> OfflineTrainer
-> per-task eval + checkpoint (reference: tdmpc2/trainer/offline_trainer.py),
exercised end-to-end on a synthetic 2-task toy dataset (SURVEY.md §4)."""

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.envs import make_env
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.trainer import OfflineTrainer
from tdmpc2_tpu.utils.logger import Logger



pytestmark = pytest.mark.slow  # offline pipeline e2e

def multitask_cfg(tmp_path, **kw):
    cfg = Config(task='toy-mt2', batch_size=8, latent_dim=16, mlp_dim=32,
                 enc_dim=32, num_q=2, num_bins=5, num_samples=16,
                 num_elites=4, num_pi_trajs=2, iterations=1, horizon=3,
                 task_dim=8, save_agent=True, save_csv=False,
                 eval_episodes=1)
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg = parse_cfg(cfg)
    cfg.multitask = True
    cfg.tasks = ['toy-reach', 'toy-reach']
    cfg.task_dim = 8
    cfg.work_dir = str(tmp_path / 'work')
    return cfg


def write_synthetic_chunks(data_dir, n_chunks=2, eps_per_chunk=3, rows=51,
                           obs_dim=6, act_dim=2):
    data_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for c in range(n_chunks):
        np.savez(
            data_dir / f'chunk_{c}.npz',
            obs=rng.standard_normal((eps_per_chunk, rows, obs_dim)).astype(np.float32),
            action=rng.uniform(-1, 1, (eps_per_chunk, rows, act_dim)).astype(np.float32),
            reward=rng.standard_normal((eps_per_chunk, rows)).astype(np.float32),
            task=np.tile(np.arange(eps_per_chunk) % 2, (rows, 1)).T.astype(np.int64))


def test_offline_trainer_end_to_end(tmp_path):
    cfg = multitask_cfg(tmp_path, steps=5, eval_freq=5, save_csv=True,
                        data_dir=str(tmp_path / 'data'))
    env = make_env(cfg)
    assert cfg.obs_shape['state'][0] == 6  # padded multitask obs dim
    write_synthetic_chunks(tmp_path / 'data', obs_dim=6,
                           act_dim=cfg.action_dim, rows=cfg.episode_length + 1)
    agent = TDMPC2(cfg)
    buffer = Buffer(cfg)
    logger = Logger(cfg)
    trainer = OfflineTrainer(cfg=cfg, env=env, agent=agent, buffer=buffer,
                             logger=logger)
    trainer.train()
    assert trainer.buffer.num_eps == 6
    batch = trainer.buffer.sample()
    assert batch[4] is not None and batch[4].shape == (cfg.batch_size,)
    # final checkpoint was written and is loadable
    ckpts = list((tmp_path / 'work' / 'models').glob('*.pkl'))
    assert ckpts
    agent2 = TDMPC2(cfg)
    agent2.load(str(ckpts[0]))
    # aggregate eval row written to eval.csv (exportable artifact)
    csv_lines = (tmp_path / 'work' / 'eval.csv').read_text().splitlines()
    assert csv_lines[0] == 'step,episode_reward,episode_success'
    assert len(csv_lines) >= 2


def test_offline_trainer_end_to_end_sharded(tmp_path):
    """The mt30/mt80 north-star path: OfflineTrainer with the agent sharded
    over a ('data','model') mesh — exactly as `train.py mesh_shape=4x2`
    wires it (mesh passed to the agent, no explicit context manager) — must
    train, eval, and checkpoint on the virtual 8-device CPU mesh."""
    import jax

    from tdmpc2_tpu import parallel

    cfg = multitask_cfg(tmp_path, steps=4, eval_freq=4,
                        data_dir=str(tmp_path / 'data'))
    env = make_env(cfg)
    write_synthetic_chunks(tmp_path / 'data', obs_dim=6,
                           act_dim=cfg.action_dim, rows=cfg.episode_length + 1)
    mesh = parallel.make_mesh('4x2', devices=jax.devices()[:8])
    agent = TDMPC2(cfg, mesh=mesh)
    trainer = OfflineTrainer(cfg=cfg, env=env, agent=agent,
                             buffer=Buffer(cfg), logger=Logger(cfg))
    trainer.train()
    assert trainer.buffer.num_eps == 6
    # update batches were data-parallel over the mesh; params FSDP-sharded
    sharded = any(
        len(getattr(l.sharding, 'spec', ())) and any(l.sharding.spec)
        for l in jax.tree.leaves(agent.state.params))
    assert sharded, 'no parameter leaf is sharded over the mesh'
    ckpts = list((tmp_path / 'work' / 'models').glob('*.pkl'))
    assert ckpts


def test_pt_chunk_loader(tmp_path):
    """TensorDict-style .pt chunks load through torch when available."""
    torch = pytest.importorskip('torch')
    from tdmpc2_tpu.trainer.offline import _load_chunk
    fp = tmp_path / 'chunk.pt'
    torch.save({'obs': torch.zeros(2, 5, 4), 'action': torch.zeros(2, 5, 2),
                'reward': torch.zeros(2, 5), 'task': torch.zeros(2, 5)}, fp)
    chunk = _load_chunk(str(fp))
    assert chunk['obs'].shape == (2, 5, 4)
    assert isinstance(chunk['reward'], np.ndarray)


def test_offline_trainer_resume(tmp_path):
    """resume=true continues from the latest iteration checkpoint: the
    second trainer starts at iteration 5 (not 0) and extends training to 10
    with a second checkpoint."""
    cfg = multitask_cfg(tmp_path, steps=5, eval_freq=5, save_csv=True,
                        data_dir=str(tmp_path / 'data'))
    env = make_env(cfg)
    write_synthetic_chunks(tmp_path / 'data', obs_dim=6,
                           act_dim=cfg.action_dim, rows=cfg.episode_length + 1)
    trainer = OfflineTrainer(cfg=cfg, env=env, agent=TDMPC2(cfg),
                             buffer=Buffer(cfg), logger=Logger(cfg))
    trainer.train()
    assert (tmp_path / 'work' / 'models' / '5.pkl').exists()

    cfg2 = cfg.replace(steps=10, resume=True)
    trainer2 = OfflineTrainer(cfg=cfg2, env=env, agent=TDMPC2(cfg2),
                              buffer=Buffer(cfg2), logger=Logger(cfg2))
    assert trainer2._maybe_resume() == 5
    trainer2.train()   # loads again internally; trains 5 -> 10
    assert (tmp_path / 'work' / 'models' / '10.pkl').exists()
    csv_lines = (tmp_path / 'work' / 'eval.csv').read_text().splitlines()
    steps = [int(l.split(',')[0]) for l in csv_lines[1:]]
    assert 5 in steps and 10 in steps


def test_evaluate_cli_multitask_batched(tmp_path):
    """Multitask evaluate: the batched-over-tasks lockstep path reports a
    per-task result dict + normalized score from a saved checkpoint."""
    cfg = multitask_cfg(tmp_path, steps=5, eval_freq=5,
                        data_dir=str(tmp_path / 'data'))
    env = make_env(cfg)
    write_synthetic_chunks(tmp_path / 'data', obs_dim=6,
                           act_dim=cfg.action_dim, rows=cfg.episode_length + 1)
    agent = TDMPC2(cfg)
    fp = tmp_path / 'work' / 'models' / 'eval_ckpt.pkl'
    fp.parent.mkdir(parents=True, exist_ok=True)
    agent.save(fp)

    from tdmpc2_tpu.evaluate import evaluate
    cfg2 = cfg.replace(checkpoint=str(fp), eval_episodes=1)
    results = evaluate(cfg2)
    assert set(results) == set(cfg.tasks)
    for r, s in results.values():
        assert np.isfinite(r)
