"""Host-side vectorized environment.

No reference counterpart (the reference steps ONE env synchronously,
reference: tdmpc2/trainer/online_trainer.py:74-127); this is the batched
actor half of the BASELINE.json north star: N env copies stepped together on
the host, feeding one batched `act` call per vector step so the per-step
host<->device round trip is amortized over N environment transitions.
"""

from __future__ import annotations

import numpy as np


class VecEnv:
    """N same-task env copies with stacked obs/action/reward interfaces."""

    def __init__(self, envs):
        assert len(envs) > 0
        self.envs = envs
        self.observation_space = envs[0].observation_space
        self.action_space = envs[0].action_space
        self.max_episode_steps = envs[0].max_episode_steps

    @property
    def num_envs(self) -> int:
        return len(self.envs)

    def reset(self):
        return np.stack([e.reset() for e in self.envs])

    def reset_at(self, i: int):
        """Reset one env copy (per-env episode boundaries, episodic tasks)."""
        return self.envs[i].reset()

    def step(self, actions):
        obs, rewards, dones, infos = [], [], [], []
        for e, a in zip(self.envs, actions):
            o, r, d, i = e.step(a)
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(i)
        return (np.stack(obs), np.asarray(rewards, np.float32),
                np.asarray(dones), infos)

    def rand_act(self):
        return np.stack([e.rand_act() for e in self.envs])

    def render(self, *args, **kwargs):
        return self.envs[0].render(*args, **kwargs)


def make_vec_env(cfg, make_single, seed_list=None):
    """Build a VecEnv of decorrelated same-task copies.

    Default: cfg.num_envs copies seeded cfg.seed + 1000*i. `seed_list`
    overrides both count and seeds (fleet training: K seeds x N copies)."""
    from copy import deepcopy
    seeds = (list(seed_list) if seed_list is not None
             else [cfg.seed + 1000 * i for i in range(cfg.num_envs)])
    envs = []
    for s in seeds:
        _cfg = deepcopy(cfg)
        _cfg.seed = int(s)
        envs.append(make_single(_cfg))
    return VecEnv(envs)
