"""End-to-end integration: full online training loop on the toy CI env
(SURVEY.md §4 integration strategy — no physics dependency)."""

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.envs import make_env
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.trainer import OnlineTrainer
from tdmpc2_tpu.utils.logger import Logger



pytestmark = pytest.mark.slow  # online training loop e2e

def small_cfg(tmp_path, **kw):
    cfg = parse_cfg(Config(task='toy-reach'))
    cfg.steps = 220
    cfg.eval_freq = 200
    cfg.eval_episodes = 1
    cfg.batch_size = 16
    cfg.enc_dim = 32
    cfg.mlp_dim = 32
    cfg.latent_dim = 16
    cfg.num_q = 2
    cfg.num_samples = 32
    cfg.num_elites = 4
    cfg.num_pi_trajs = 4
    cfg.iterations = 1
    cfg.horizon = 3
    cfg.save_video = False
    cfg.save_agent = False
    cfg.work_dir = str(tmp_path)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_online_training_loop_end_to_end(tmp_path):
    cfg = small_cfg(tmp_path)
    env = make_env(cfg)
    assert cfg.obs_shape == {'state': (6,)}
    assert cfg.action_dim == 2
    assert cfg.episode_length == 50
    cfg.seed_steps = 60  # shrink the seed phase for CI
    agent = TDMPC2(cfg)
    buffer = Buffer(cfg)
    logger = Logger(cfg)
    trainer = OnlineTrainer(cfg=cfg, env=env, agent=agent,
                            buffer=buffer, logger=logger)
    trainer.train()
    assert trainer._step == cfg.steps + 1
    assert buffer.num_eps >= 3
    # eval CSV written with the published-results schema
    csv = (tmp_path / 'eval.csv').read_text().splitlines()
    assert csv[0] == 'step,episode_reward,episode_success'
    assert len(csv) >= 2
    # agent still acts after training
    a = agent.act(env.reset(), t0=True, eval_mode=True)
    assert np.all(np.abs(a) <= 1)


def test_toy_env_protocol():
    cfg = parse_cfg(Config(task='toy-reach'))
    env = make_env(cfg)
    obs = env.reset()
    assert obs.shape == (6,) and obs.dtype == np.float32
    a = env.rand_act()
    obs2, r, done, info = env.step(a)
    assert obs2.shape == (6,)
    assert 0.0 <= r <= 1.0
    assert not done
    assert set(info) >= {'success', 'terminated'}
    # episode terminates exactly at 50 steps
    env.reset()
    steps = 0
    done = False
    while not done:
        _, _, done, _ = env.step(env.rand_act())
        steps += 1
    assert steps == 50


def test_seed_steps_default():
    cfg = parse_cfg(Config(task='toy-reach'))
    make_env(cfg)
    assert cfg.seed_steps == max(1000, 5 * cfg.episode_length)


def test_episodic_training_loop(tmp_path):
    """Trainer-level episodic path: early termination feeds the termination
    head and variable-length episodes reach the buffer (reference
    online_trainer.py:90-101 episodic semantics)."""
    cfg = parse_cfg(Config(
        task='toy-reach-episodic', episodic=True, batch_size=8,
        latent_dim=16, mlp_dim=32, enc_dim=32, num_q=2, num_bins=5,
        num_samples=16, num_elites=4, num_pi_trajs=2, iterations=1,
        horizon=3, steps=260, eval_freq=1000, eval_episodes=1,
        save_agent=False, save_csv=False))
    cfg.work_dir = str(tmp_path)
    env = make_env(cfg)
    cfg.seed_steps = 150
    agent = TDMPC2(cfg)
    assert 'termination' in agent.state.params
    buffer = Buffer(cfg)
    logger = Logger(cfg)
    OnlineTrainer(cfg=cfg, env=env, agent=agent, buffer=buffer,
                  logger=logger).train()
    assert buffer.num_eps >= 3
    batch = buffer.sample()
    term = np.asarray(batch[3])
    assert np.isfinite(term).all() and term.min() >= 0.0


def test_evaluate_cli_roundtrip(tmp_path):
    """evaluate.py: checkpoint -> greedy eval episodes (reference
    evaluate.py:20-99)."""
    from tdmpc2_tpu.evaluate import evaluate
    cfg = parse_cfg(Config(
        task='toy-reach', batch_size=8, latent_dim=16, mlp_dim=32,
        enc_dim=32, num_q=2, num_bins=5, num_samples=16, num_elites=4,
        num_pi_trajs=2, iterations=1, horizon=3, eval_episodes=2,
        save_csv=False, save_agent=True))
    cfg.work_dir = str(tmp_path)
    env = make_env(cfg)
    agent = TDMPC2(cfg)
    fp = tmp_path / 'agent.pkl'
    agent.save(fp)

    cfg2 = parse_cfg(Config(
        task='toy-reach', batch_size=8, latent_dim=16, mlp_dim=32,
        enc_dim=32, num_q=2, num_bins=5, num_samples=16, num_elites=4,
        num_pi_trajs=2, iterations=1, horizon=3, eval_episodes=2,
        checkpoint=str(fp), save_csv=False))
    results = evaluate(cfg2)
    (r, s), = results.values()
    assert np.isfinite(r)
    assert 0.0 <= s <= 1.0


def test_eval_csv_schema(tmp_path):
    """eval.csv matches the published results schema
    (reference logger.py:235-240, results/*.csv)."""
    import csv
    cfg = parse_cfg(Config(task='toy-reach', save_csv=True, save_agent=False))
    cfg.work_dir = str(tmp_path)
    logger = Logger(cfg)
    logger.log(dict(step=100, episode_reward=1.5, episode_success=0.0), 'eval')
    logger.log(dict(step=200, episode_reward=2.5, episode_success=1.0), 'eval')
    with open(tmp_path / 'eval.csv') as f:
        rows = list(csv.DictReader(f))
    assert [r['step'] for r in rows] == ['100', '200']
    assert float(rows[1]['episode_reward']) == 2.5
    assert set(rows[0]) == {'step', 'episode_reward', 'episode_success'}
