"""Mocked-package tests for the three env adapters whose backends are not
installed in this image (Meta-World, ManiSkill2, MyoSuite).

The packages' APIs are mocked at the sys.modules level and the adapters are
driven through the real factory chain (`tdmpc2_tpu.envs.make_env`), pinning
the behavioral contract the reference specifies:
  - Meta-World  (reference tdmpc2/envs/metaworld.py:8-52): mw-* name
    mangling to *-v2-goal-observable, corner2 camera repositioned, unfrozen
    goal randomization, an extra zero-action settle step after reset (obs
    returned is the PRE-settle one), action repeat 2, never terminates,
    100-step timeout.
  - ManiSkill2  (reference tdmpc2/envs/maniskill.py:8-82): 5-task registry
    with per-task control modes, symmetrized action box, action repeat 2
    with early break on done, info['terminated'] passthrough.
  - MyoSuite    (reference tdmpc2/envs/myosuite.py:6-58): 10-task registry,
    success == info['solved'], NO action repeat, never terminates.
"""

import sys
import types

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.envs import make_env


class _Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        shape = shape or np.asarray(low).shape
        self.low = np.broadcast_to(np.asarray(low, dtype), shape).copy()
        self.high = np.broadcast_to(np.asarray(high, dtype), shape).copy()
        self.shape, self.dtype = tuple(shape), dtype

    def sample(self):
        return np.random.uniform(self.low, self.high).astype(np.float32)


def _cfg(task):
    cfg = parse_cfg(Config(task=task))
    cfg.num_envs = 1
    return cfg


# ---------------------------------------------------------------- Meta-World


class _MockMWEnv:
    """Mimics a metaworld *GoalObservable env (old gym 0.21 API)."""

    def __init__(self, seed=None):
        self.seed_arg = seed
        self.observation_space = _Box(-np.inf, np.inf, (39,))
        self.action_space = _Box(-1.0, 1.0, (4,))
        self.model = types.SimpleNamespace(cam_pos=np.zeros((3, 3)))
        self._freeze_rand_vec = True
        self.actions = []
        self._t = 0

    def reset(self):
        self._t = 0
        return np.zeros(39, np.float32)

    def step(self, action):
        self.actions.append(np.asarray(action).copy())
        self._t += 1
        obs = np.full(39, self._t, np.float32)
        return obs, 1.0, False, {'success': 0.0}


@pytest.fixture
def mw_modules(monkeypatch):
    made = {}

    def factory(seed=None):
        made['env'] = _MockMWEnv(seed=seed)
        return made['env']

    envs_mod = types.ModuleType('metaworld.envs')
    envs_mod.ALL_V2_ENVIRONMENTS_GOAL_OBSERVABLE = {
        'assembly-v2-goal-observable': factory}
    pkg = types.ModuleType('metaworld')
    pkg.envs = envs_mod
    monkeypatch.setitem(sys.modules, 'metaworld', pkg)
    monkeypatch.setitem(sys.modules, 'metaworld.envs', envs_mod)
    return made


def test_metaworld_adapter_contract(mw_modules):
    cfg = _cfg('mw-assembly')
    env = make_env(cfg)
    mock = mw_modules['env']
    # name mangling found the registry entry and passed the seed through
    assert mock.seed_arg == cfg.seed
    # camera + randomization mutations (reference metaworld.py:13-15)
    np.testing.assert_allclose(mock.model.cam_pos[2], [0.75, 0.075, 0.7])
    assert mock._freeze_rand_vec is False
    # env-derived cfg fields
    assert cfg.episode_length == 100
    assert cfg.action_dim == 4
    assert cfg.obs_shape['state'] == (39,)

    obs = env.reset()
    # reset returns the PRE-settle obs; exactly one zero settle step ran
    np.testing.assert_array_equal(np.asarray(obs), 0.0)
    assert len(mock.actions) == 1
    np.testing.assert_array_equal(mock.actions[0], 0.0)

    obs, reward, done, info = env.step(np.full(4, 0.5, np.float32))
    # action repeat 2: two inner steps, rewards summed, never terminates
    assert len(mock.actions) == 3
    assert reward == 2.0
    assert not done
    assert 'success' in info

    # 100-step timeout ends the episode
    for t in range(2, 101):
        obs, reward, done, info = env.step(np.zeros(4, np.float32))
    assert done


def test_metaworld_unknown_task_degrades(mw_modules):
    with pytest.raises(ValueError):
        make_env(_cfg('mw-not-a-task'))


# ---------------------------------------------------------------- ManiSkill2


class _MockMSEnv:
    """Mimics a mani_skill2 env behind gymnasium (5-tuple API)."""

    def __init__(self, done_at=10 ** 9):
        self.observation_space = _Box(-np.inf, np.inf, (42,))
        # asymmetric box: the adapter must symmetrize to [-2, 2]
        self.action_space = _Box([-1.0] * 3 + [-2.0], [0.5] * 3 + [2.0])
        self.done_at = done_at
        self.n_steps = 0

    def reset(self):
        self.n_steps = 0
        return np.zeros(42, np.float32), {}

    def step(self, action):
        self.n_steps += 1
        term = self.n_steps >= self.done_at
        return (np.full(42, self.n_steps, np.float32), 1.0, term, False,
                {'success': float(term)})


@pytest.fixture
def ms_modules(monkeypatch):
    made = {}

    def gym_make(env_id, **kwargs):
        made['env_id'] = env_id
        made['kwargs'] = kwargs
        made['env'] = _MockMSEnv(done_at=made.get('done_at', 10 ** 9))
        return made['env']

    gym_stub = types.ModuleType('gymnasium')
    gym_stub.make = gym_make
    ms_pkg = types.ModuleType('mani_skill2')
    ms_envs = types.ModuleType('mani_skill2.envs')
    ms_pkg.envs = ms_envs
    monkeypatch.setitem(sys.modules, 'gymnasium', gym_stub)
    monkeypatch.setitem(sys.modules, 'mani_skill2', ms_pkg)
    monkeypatch.setitem(sys.modules, 'mani_skill2.envs', ms_envs)
    return made


def test_maniskill_adapter_contract(ms_modules):
    cfg = _cfg('pick-ycb')
    env = make_env(cfg)
    # registry: env id + per-task control mode (reference maniskill.py:8-29)
    assert ms_modules['env_id'] == 'PickSingleYCB-v0'
    assert ms_modules['kwargs']['control_mode'] == 'pd_ee_delta_pose'
    assert ms_modules['kwargs']['obs_mode'] == 'state'
    # symmetrized action box (reference maniskill.py:38-42)
    np.testing.assert_array_equal(env.action_space.low, -2.0)
    np.testing.assert_array_equal(env.action_space.high, 2.0)
    assert cfg.episode_length == 100

    env.reset()
    obs, reward, done, info = env.step(np.zeros(4, np.float32))
    # action repeat 2, rewards summed, terminated passthrough
    assert ms_modules['env'].n_steps == 2
    assert reward == 2.0 and not done
    assert info['terminated'] == 0.0


def test_maniskill_early_break_on_done(ms_modules):
    ms_modules['done_at'] = 1  # inner env terminates on its first step
    cfg = _cfg('lift-cube')
    env = make_env(cfg)
    assert ms_modules['env_id'] == 'LiftCube-v0'
    assert ms_modules['kwargs']['control_mode'] == 'pd_ee_delta_pos'
    env.reset()
    obs, reward, done, info = env.step(np.zeros(4, np.float32))
    # early break: ONE inner step, done + terminated propagate
    assert ms_modules['env'].n_steps == 1
    assert reward == 1.0 and done
    assert info['terminated'] == 1.0


# ------------------------------------------------------------------ MyoSuite


class _MockMyoEnv:
    def __init__(self):
        self.observation_space = _Box(-np.inf, np.inf, (115,))
        self.action_space = _Box(0.0, 1.0, (39,))
        self.n_steps = 0

    def reset(self):
        self.n_steps = 0
        return np.zeros(115, np.float32), {}

    def step(self, action):
        self.n_steps += 1
        return (np.full(115, self.n_steps, np.float32), 0.5, True, False,
                {'solved': 1.0})


@pytest.fixture
def myo_modules(monkeypatch):
    made = {}

    def myo_make(env_id):
        made['env_id'] = env_id
        made['env'] = _MockMyoEnv()
        return made['env']

    pkg = types.ModuleType('myosuite')
    utils = types.ModuleType('myosuite.utils')
    utils.gym = types.SimpleNamespace(make=myo_make)
    pkg.utils = utils
    monkeypatch.setitem(sys.modules, 'myosuite', pkg)
    monkeypatch.setitem(sys.modules, 'myosuite.utils', utils)
    return made


def test_myosuite_adapter_contract(myo_modules):
    cfg = _cfg('myo-key-turn')
    env = make_env(cfg)
    assert myo_modules['env_id'] == 'myoHandKeyTurnFixed-v0'
    assert cfg.episode_length == 100
    env.reset()
    obs, reward, done, info = env.step(np.zeros(39, np.float32))
    # NO action repeat; never terminates even when the raw env says done;
    # success mirrors info['solved'] (reference myosuite.py:32-33)
    assert myo_modules['env'].n_steps == 1
    assert reward == 0.5
    assert not done
    assert info['success'] == 1.0
