"""Environment-layer tests: dm_control adapter semantics + factory chain."""

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.envs import make_env


def _cfg(task, **kw):
    cfg = parse_cfg(Config(task=task))
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_dmc_cartpole_state():
    cfg = _cfg('cartpole-balance')
    env = make_env(cfg)
    assert cfg.obs_shape == {'state': (5,)}
    assert cfg.action_dim == 1
    assert cfg.episode_length == 500
    assert cfg.seed_steps == 2500
    obs = env.reset()
    assert obs.dtype == np.float32 and obs.shape == (5,)
    total_r = 0.0
    for _ in range(5):
        obs, r, done, info = env.step(env.rand_act())
        total_r += r
        assert not done
        assert info['terminated'] == 0.0
    assert total_r > 0  # balance task gives reward while upright


def test_dmc_action_repeat_and_timeout():
    """Episode ends after exactly 500 wrapper steps (1000 physics steps)."""
    cfg = _cfg('cartpole-balance')
    env = make_env(cfg)
    env.reset()
    done, steps = False, 0
    a = env.rand_act()
    while not done:
        _, _, done, _ = env.step(a)
        steps += 1
        assert steps <= 500
    assert steps == 500


def test_dmc_name_demangling():
    cfg = _cfg('cup-catch')
    env = make_env(cfg)  # cup -> ball_in_cup
    obs = env.reset()
    assert obs.shape == (8,)


def test_unknown_task_raises():
    cfg = _cfg('nonexistent-task-xyz')
    with pytest.raises(ValueError, match='Failed to make environment'):
        make_env(cfg)


def test_missing_dependency_tasks_raise_cleanly():
    # metaworld/maniskill/myosuite are not installed in this image
    for task in ('mw-assembly', 'lift-cube', 'myo-key-turn'):
        cfg = _cfg(task)
        with pytest.raises(ValueError):
            make_env(cfg)


def test_multitask_env_padding_and_switching():
    # build a small 2-task multitask env by shrinking the task list
    cfg = _cfg('mt30')
    cfg.tasks = ['cartpole-balance', 'walker-walk']
    env = make_env(cfg)
    assert cfg.obs_shapes == [5, 24]
    assert cfg.action_dims == [1, 6]
    assert cfg.episode_lengths == [500, 500]
    assert cfg.action_dim == 6
    obs = env.reset(0)  # cartpole: padded 5 -> 24
    assert obs.shape == (24,)
    np.testing.assert_array_equal(obs[5:], 0.0)
    # action truncation: 6-dim action into 1-dim cartpole
    obs, r, done, info = env.step(np.ones(6, np.float32))
    assert obs.shape == (24,)
    obs = env.reset(1)  # walker
    assert np.any(obs[5:] != 0.0) or obs.shape == (24,)


def test_dmc_pixel_observations():
    """Pixel mode: 3-frame stack of 64x64 RGB, channel-first uint8
    (reference envs/dmcontrol.py:66-89)."""
    cfg = parse_cfg(Config(task='cartpole-balance', obs='rgb'))
    env = make_env(cfg)
    obs = env.reset()
    assert obs.shape == (9, 64, 64) and obs.dtype == np.uint8
    assert cfg.obs_shape == {'rgb': (9, 64, 64)}
    obs2, r, done, info = env.step(env.rand_act())
    assert obs2.shape == (9, 64, 64)
    # frame stack shifts: newest frame occupies the last 3 channels
    assert not np.array_equal(obs, obs2) or np.allclose(r, 0)


def test_gym_mujoco_adapter():
    """Gymnasium MuJoCo tasks: episodic terminated passthrough, timeouts,
    cfg mutation (reference envs/mujoco.py:24-58)."""
    pytest = __import__('pytest')
    pytest.importorskip('gymnasium')
    cfg = parse_cfg(Config(task='mujoco-walker', episodic=True))
    env = make_env(cfg)
    assert cfg.discount_max == 0.99 and cfg.rho == 0.7  # reference quirk
    assert cfg.episode_length == 1000
    obs = env.reset()
    assert obs.dtype == np.float32 and obs.shape == (17,)
    obs, r, done, info = env.step(env.rand_act())
    assert 'terminated' in info and isinstance(info['terminated'], float)


@pytest.mark.slow
@pytest.mark.parametrize('task,obs_dim,action_dim', [
    ('dog-run', 223, 38),        # reference horizon 14M; heaviest DMControl
    ('humanoid-walk', 67, 21),   # model (dims: reference results + dm_control
])                               # suite defaults)
def test_heavyweight_dmcontrol_tasks(task, obs_dim, action_dim):
    """The dog/humanoid family builds and steps through the adapter (env
    layer validation for the largest reference tasks; training them is
    outside this chip budget — docs/ROADMAP.md)."""
    cfg = parse_cfg(Config(task=task))
    env = make_env(cfg)
    obs = env.reset()
    assert np.asarray(obs).shape == (obs_dim,)
    assert cfg.action_dim == action_dim
    for _ in range(3):
        obs, reward, done, info = env.step(env.rand_act())
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(reward)
