#!/usr/bin/env python
"""Collect random-policy episodes on the real DMControl mt30 tasks into
native `.npz` dataset chunks with the exact mt30 geometry.

The published mt30 dataset (reference trainer/offline_trainer.py:42-65,
datasets/download_mt30.sh) is unreachable in this environment; this script
produces a drop-in substitute — real dynamics/rewards under a uniform random
policy — so the multi-task offline pipeline (`train.py task=mt30
data_dir=...`) runs end-to-end at configurable scale.

Geometry matches the published chunks: per episode `rows = episode_length+1`
(leading bootstrap row: NaN action, 0 reward — reference
trainer/online_trainer.py:54-72 semantics), obs zero-padded to the task-set
max dim, actions zero-padded to the max action dim, per-episode task index.

Usage:
    python scripts/collect_mt30_random.py --episodes-per-task 20 \
        --out datasets/mt30_rand [--chunk-eps 150] [--seed 0] [--nice 19]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--episodes-per-task', type=int, default=20)
    ap.add_argument('--out', default='datasets/mt30_rand')
    ap.add_argument('--chunk-eps', type=int, default=150,
                    help='episodes per .npz chunk file')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--chunk-offset', type=int, default=0,
                    help='first chunk index (append to an existing dir)')
    ap.add_argument('--nice', type=int, default=0,
                    help='renice self (run politely next to a training job)')
    ap.add_argument('--tasks', nargs='*', default=None,
                    help='subset of mt30 tasks (default: all 30)')
    args = ap.parse_args()
    if args.nice:
        os.nice(args.nice)

    import jax
    jax.config.update('jax_platforms', 'cpu')  # no TPU use from this process

    from tdmpc2_tpu.config import TASK_SET, Config, parse_cfg
    from tdmpc2_tpu.envs import make_env

    tasks = args.tasks or TASK_SET['mt30']
    task_ids = {t: i for i, t in enumerate(TASK_SET['mt30'])}
    os.makedirs(args.out, exist_ok=True)

    # Build each env once, discover padded dims.
    envs = {}
    for t in tasks:
        cfg = parse_cfg(Config(task=t))
        envs[t] = make_env(cfg)
    obs_dim = max(e.observation_space.shape[0] for e in envs.values())
    act_dim = max(e.action_space.shape[0] for e in envs.values())
    rows = max(e.max_episode_steps for e in envs.values()) + 1
    print(f'{len(tasks)} tasks, padded obs_dim={obs_dim} act_dim={act_dim} '
          f'rows={rows}')

    rng = np.random.default_rng(args.seed)
    buf, chunk_idx, n_total = [], args.chunk_offset, 0
    t_start = time.time()

    def flush():
        nonlocal buf, chunk_idx
        if not buf:
            return
        arrays = {k: np.stack([ep[k] for ep in buf])
                  for k in ('obs', 'action', 'reward', 'task')}
        fp = os.path.join(args.out, f'chunk_{chunk_idx}.npz')
        np.savez_compressed(fp, **arrays)
        print(f'  wrote {fp}: {len(buf)} episodes '
              f'({time.time() - t_start:.0f}s elapsed)', flush=True)
        buf, chunk_idx = [], chunk_idx + 1

    # Round-robin over tasks so every chunk mixes tasks (the sampler is
    # uniform anyway, but partial datasets stay balanced).
    for ep_i in range(args.episodes_per_task):
        for t in tasks:
            env = envs[t]
            a_dim = env.action_space.shape[0]
            ep_len = env.max_episode_steps
            obs_l, act_l, rew_l = [], [], []
            obs = env.reset()
            obs_l.append(obs)
            act_l.append(np.full(act_dim, np.nan, np.float32))  # bootstrap row
            rew_l.append(0.0)
            done = False
            while not done:
                a = rng.uniform(-1, 1, a_dim).astype(np.float32)
                obs, r, done, _ = env.step(a)
                obs_l.append(obs)
                a_pad = np.zeros(act_dim, np.float32)
                a_pad[:a_dim] = a
                act_l.append(a_pad)
                rew_l.append(float(r))
            o = np.zeros((rows, obs_dim), np.float32)
            o[:len(obs_l), :obs_l[0].shape[0]] = np.stack(obs_l)
            a = np.zeros((rows, act_dim), np.float32)
            a[:len(act_l)] = np.stack(act_l)
            r = np.zeros((rows,), np.float32)
            r[:len(rew_l)] = np.asarray(rew_l, np.float32)
            assert len(obs_l) == ep_len + 1, (t, len(obs_l), ep_len)
            buf.append(dict(obs=o, action=a, reward=r,
                            task=np.int32(task_ids[t])))
            n_total += 1
            if len(buf) >= args.chunk_eps:
                flush()
    flush()
    print(f'done: {n_total} episodes -> {args.out} '
          f'in {time.time() - t_start:.0f}s')


if __name__ == '__main__':
    main()
