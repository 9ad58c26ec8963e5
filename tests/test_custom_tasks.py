"""Custom DMControl task variants: registration, models, reward ranges.

The reference ships these 28 tasks with no tests (SURVEY.md §4); we check
registration completeness, the programmatic model patches, and that every
task steps with per-step rewards in [0, 1].
"""

import numpy as np
import pytest

dm_control = pytest.importorskip('dm_control')

from dm_control import suite  # noqa: E402

import tdmpc2_tpu.envs.tasks  # noqa: E402,F401  (registration side effect)
from tdmpc2_tpu.config import Config, parse_cfg  # noqa: E402
from tdmpc2_tpu.envs import make_env  # noqa: E402
from tdmpc2_tpu.envs.tasks import _models  # noqa: E402

EXPECTED = {
    'cheetah': {'run_backwards', 'stand_front', 'stand_back', 'jump',
                'run_front', 'run_back', 'lie_down', 'legs_up', 'flip',
                'flip_backwards'},
    'walker': {'walk_backwards', 'run_backwards', 'arabesque', 'lie_down',
               'legs_up', 'headstand', 'flip', 'backflip'},
    'hopper': {'hop_backwards', 'flip', 'flip_backwards'},
    'reacher': {'three_easy', 'three_hard', 'four_easy', 'four_hard'},
    'ball_in_cup': {'spin'},
    'pendulum': {'spin'},
    'fish': {'obstacles'},
}


def test_all_28_registered():
    custom = suite._get_tasks('custom')
    by_domain = {}
    for d, t in custom:
        by_domain.setdefault(d, set()).add(t)
    assert sum(len(v) for v in EXPECTED.values()) == 28
    for domain, tasks in EXPECTED.items():
        assert tasks <= by_domain.get(domain, set()), domain
    # registered tasks are loadable through the suite index
    assert ('cheetah', 'run_backwards') in suite.ALL_TASKS


def test_widened_arenas():
    assert 'size="200 ' in _models.widened_arena('cheetah', 'ground', 200)
    assert 'size="500 ' in _models.widened_arena('walker', 'floor', 500)


def test_fish_walls():
    xml = _models.fish_with_walls()
    for i in range(4):
        assert f'wall{i}' in xml


@pytest.mark.parametrize('links,n_motors', [(3, 3), (4, 4)])
def test_multilink_reacher_model(links, n_motors):
    xml = _models.multilink_reacher(links)
    assert xml.count('<motor') == n_motors + 1  # shoulders + wrist
    env = suite.load('reacher', f'{"three" if links == 3 else "four"}_easy')
    spec = env.action_spec()
    assert spec.shape == (links,)


@pytest.mark.parametrize('task', [
    'cheetah-run-backwards', 'walker-backflip', 'hopper-flip',
    'reacher-three-hard', 'cup-spin', 'pendulum-spin', 'fish-obstacles'])
def test_custom_task_steps_and_reward_range(task):
    cfg = parse_cfg(Config(task=task, seed=3))
    env = make_env(cfg)
    obs = env.reset()
    assert obs.dtype == np.float32
    for _ in range(5):
        obs, r, done, info = env.step(env.rand_act())
        # action repeat 2 sums two [0,1] rewards
        assert 0.0 <= float(r) <= 2.0 + 1e-6
    assert env.max_episode_steps == 500


def test_multitask_env_over_real_suite():
    """Multitask wrapper over real DMControl tasks (standard + custom):
    obs padding, action truncation, per-task episode lengths
    (reference envs/__init__.py:37-55)."""
    from tdmpc2_tpu.envs import make_multitask_env
    cfg = parse_cfg(Config(task='mt30'))
    cfg.multitask = True
    cfg.tasks = ['walker-walk', 'cheetah-run-backwards', 'cup-spin']
    env = make_multitask_env(cfg)
    assert cfg.obs_shapes == [24, 17, 8]
    assert cfg.action_dims == [6, 6, 2]
    assert cfg.episode_lengths == [500, 500, 500]
    max_obs = max(cfg.obs_shapes)
    for idx in range(3):
        obs = env.reset(idx)
        assert obs.shape == (max_obs,)
        if cfg.obs_shapes[idx] < max_obs:  # zero-padded tail
            assert np.allclose(obs[cfg.obs_shapes[idx]:], 0.0)
        a = env.rand_act()
        assert a.shape == (max(cfg.action_dims),)
        obs2, r, done, info = env.step(a)
        assert obs2.shape == (max_obs,) and np.isfinite(r)


def test_mt30_task_set_constructs():
    """Every mt30 task (19 standard + 11 custom DMControl) constructs and
    resets through the multitask factory (reference common/__init__.py:26-44)."""
    from tdmpc2_tpu.envs import make_multitask_env
    cfg = parse_cfg(Config(task='mt30'))
    env = make_multitask_env(cfg)
    assert len(env.envs) == 30
    assert len(cfg.obs_shapes) == 30 and max(cfg.obs_shapes) > 0
    obs = env.reset(29)  # pendulum-spin, the last custom task
    assert obs.shape == (max(cfg.obs_shapes),)
