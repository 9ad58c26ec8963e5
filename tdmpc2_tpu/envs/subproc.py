"""Subprocess-parallel vectorized environment.

No reference counterpart (the reference steps ONE env synchronously,
reference: tdmpc2/trainer/online_trainer.py:74-127). This is the parallel
actor half of the batched collection design: each worker process owns one
env instance — its own MuJoCo state and EGL render context (EGL contexts are
thread-affine, so in-process threading cannot parallelize rendering; measured
186 ms for 8 serial pixel env steps vs ~4x less across 4 cores here).
Commands are pipelined: `step` sends all N actions before receiving any
result, so physics + rendering overlap across workers and with the caller's
device work.
"""

from __future__ import annotations

import multiprocessing as mp
from copy import deepcopy

import numpy as np


def _worker(remote, cfg):
    """Child process loop: builds the env locally (numpy-only; never touches
    the TPU client) and serves commands until 'close'."""
    from tdmpc2_tpu.envs import _make_single_env
    env = _make_single_env(cfg)
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == 'step':
                remote.send(env.step(data))
            elif cmd == 'reset':
                remote.send(env.reset())
            elif cmd == 'rand_act':
                remote.send(env.rand_act())
            elif cmd == 'render':
                remote.send(env.render(**(data or {})))
            elif cmd == 'meta':
                remote.send((env.observation_space, env.action_space,
                             env.max_episode_steps))
            elif cmd == 'close':
                break
    except (EOFError, KeyboardInterrupt):
        pass
    finally:
        remote.close()


class SubprocVecEnv:
    """N same-task env copies in worker processes; VecEnv-compatible API."""

    def __init__(self, cfg, num_envs=None, seed_list=None):
        seeds = (list(seed_list) if seed_list is not None
                 else [cfg.seed + 1000 * i   # decorrelated init, like vec.py
                       for i in range(int(num_envs or cfg.num_envs))])
        n = len(seeds)
        assert n > 0
        # spawn (not fork): the parent may hold a live TPU client whose
        # state must not leak into children
        ctx = mp.get_context('spawn')
        self._remotes, self._procs = [], []
        for i in range(n):
            _cfg = deepcopy(cfg)
            _cfg.seed = int(seeds[i])
            _cfg.num_envs = 1
            parent, child = ctx.Pipe()
            p = ctx.Process(target=_worker, args=(child, _cfg), daemon=True)
            p.start()
            child.close()
            self._remotes.append(parent)
            self._procs.append(p)
        self._remotes[0].send(('meta', None))
        (self.observation_space, self.action_space,
         self.max_episode_steps) = self._remotes[0].recv()

    @property
    def num_envs(self) -> int:
        return len(self._remotes)

    def reset(self):
        for r in self._remotes:
            r.send(('reset', None))
        return np.stack([r.recv() for r in self._remotes])

    def reset_at(self, i: int):
        """Reset one env copy (per-env episode boundaries, episodic tasks)."""
        self._remotes[i].send(('reset', None))
        return self._remotes[i].recv()

    def step(self, actions):
        actions = np.asarray(actions)
        for r, a in zip(self._remotes, actions):
            r.send(('step', a))
        obs, rewards, dones, infos = zip(*[r.recv() for r in self._remotes])
        return (np.stack(obs), np.asarray(rewards, np.float32),
                np.asarray(dones), list(infos))

    def rand_act(self):
        for r in self._remotes:
            r.send(('rand_act', None))
        return np.stack([r.recv() for r in self._remotes])

    def render(self, **kwargs):
        self._remotes[0].send(('render', kwargs))
        return self._remotes[0].recv()

    def close(self):
        for r in self._remotes:
            try:
                r.send(('close', None))
            except (BrokenPipeError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for r in self._remotes:
            r.close()
