"""Environment factory.

`make_env(cfg)` tries each domain factory in order and fills the config's
env-derived fields (obs_shape, action_dim, episode_length, seed_steps) —
reference: tdmpc2/envs/__init__.py:37-83. The toy CI env is tried first so
tests never touch physics backends.
"""

from __future__ import annotations

from copy import deepcopy


def make_multitask_env(cfg):
    from tdmpc2_tpu.envs.multitask import MultitaskEnv
    print('Creating multi-task environment with tasks:', cfg.tasks)
    envs = []
    for task in cfg.tasks:
        _cfg = deepcopy(cfg)
        _cfg.task = task
        _cfg.multitask = False
        envs.append(_make_single_env(_cfg))
    env = MultitaskEnv(cfg, envs)
    cfg.obs_shapes = env.obs_dims
    cfg.action_dims = env.action_dims
    cfg.episode_lengths = env.episode_lengths
    return env


def _make_single_env(cfg):
    from tdmpc2_tpu.envs import (dmcontrol, gym_tasks, maniskill, metaworld,
                                 myosuite, toy)
    errors = []
    for factory in (toy.make_env, dmcontrol.make_env, maniskill.make_env,
                    metaworld.make_env, myosuite.make_env, gym_tasks.make_env):
        try:
            return factory(cfg)
        except ValueError as e:
            errors.append(str(e))
    raise ValueError(
        f'Failed to make environment "{cfg.task}": verify that dependencies '
        f'are installed and the task exists. Tried: {errors}')


def make_fleet_env(cfg, seeds):
    """Flat vector of K seeds x cfg.num_envs copies for fleet training:
    copy (k, i) is seeded seeds[k] + 1000*i — the exact env-seed layout K
    separate single-seed runs would use. Populates cfg env fields like
    make_env."""
    seed_list = [int(s) + 1000 * i for s in seeds
                 for i in range(int(cfg.get('num_envs') or 1))]
    mode = cfg.get('vec_mode', 'auto')
    if mode == 'auto':
        mode = ('subproc' if cfg.get('obs') == 'rgb'
                and not str(cfg.task).startswith('toy') else 'inproc')
    if mode == 'subproc':
        from tdmpc2_tpu.envs.subproc import SubprocVecEnv
        env = SubprocVecEnv(cfg, seed_list=seed_list)
    else:
        from tdmpc2_tpu.envs.vec import make_vec_env
        env = make_vec_env(cfg, _make_single_env, seed_list=seed_list)
    _fill_env_cfg(cfg, env)
    return env


def make_env(cfg):
    """Make an environment and populate env-derived config fields.

    cfg.num_envs > 1 builds a host-side VecEnv of decorrelated same-task
    copies for batched collection (single-task online only)."""
    if cfg.multitask:
        env = make_multitask_env(cfg)
    elif int(cfg.get('num_envs') or 1) > 1:
        mode = cfg.get('vec_mode', 'auto')
        if mode == 'auto':
            # rendering dominates rgb collection (~20 ms/frame software EGL);
            # worker processes parallelize it. The toy CI env must stay
            # in-process (workers would re-import the full package).
            mode = ('subproc' if cfg.get('obs') == 'rgb'
                    and not str(cfg.task).startswith('toy') else 'inproc')
        if mode == 'subproc':
            from tdmpc2_tpu.envs.subproc import SubprocVecEnv
            env = SubprocVecEnv(cfg)
        else:
            from tdmpc2_tpu.envs.vec import make_vec_env
            env = make_vec_env(cfg, _make_single_env)
    else:
        env = _make_single_env(cfg)
    _fill_env_cfg(cfg, env)
    return env


def _fill_env_cfg(cfg, env):
    obs_space = env.observation_space
    if isinstance(obs_space, dict):
        cfg.obs_shape = {k: v.shape for k, v in obs_space.items()}
    else:
        cfg.obs_shape = {cfg.get('obs', 'state'): tuple(obs_space.shape)}
    cfg.action_dim = env.action_space.shape[0]
    cfg.episode_length = env.max_episode_steps
    cfg.seed_steps = max(1000, 5 * cfg.episode_length)
