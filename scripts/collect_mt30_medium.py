#!/usr/bin/env python
"""Collect a medium-quality mt30 dataset from this repo's own trained agents.

The reference's published mt30 dataset is the replay buffers of its
single-task training runs (reference README.md "datasets", trainer/
offline_trainer.py:42-65) — data spanning random-to-expert quality. That
dataset is unreachable here (zero egress), so this collector produces the
closest in-repo substitute: for every mt30 task with a trained checkpoint
(results/checkpoints/<task>-s*.pkl.gz, the stripped artifacts committed by
scripts/strip_checkpoint.py, or live logs/<task>/*/*/models/latest.pkl),
episodes are rolled out with the agent's stochastic policy prior under a
cycling exploration-noise schedule (plus periodic pure-random episodes, so
the mixture covers the quality spectrum); tasks without a checkpoint fall
back to the random policy.

Chunk geometry is identical to scripts/collect_mt30_random.py (and to the
published chunks): rows = max episode_length + 1, leading bootstrap row
(NaN action, 0 reward), obs/action zero-padded to the task-set max dims,
per-episode mt30 task index.

Usage:
    python scripts/collect_mt30_medium.py --episodes-per-task 40 \
        --out datasets/mt30_medium [--chunk-eps 150] [--seed 0] [--nice 19]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# exploration-noise schedule cycled across a covered task's episodes;
# index 3 (None) marks a pure-random episode
NOISE_CYCLE = [0.0, 0.1, 0.3, None, 0.05, 0.2, 0.5, None]


def find_checkpoints(task: str) -> list:
    """One checkpoint per seed: stripped committed artifacts win over live
    log checkpoints (they are the same weights when both exist)."""
    by_seed = {}
    for fp in sorted(Path('logs').glob(f'{task}/*/*/models/latest.pkl')):
        by_seed[fp.parts[1 + fp.parts.index(task)]] = fp
    for fp in sorted(Path('results/checkpoints').glob(f'{task}-s*.pkl.gz')):
        by_seed[fp.stem.rsplit('-s', 1)[1].split('.')[0]] = fp
    return [by_seed[s] for s in sorted(by_seed)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--episodes-per-task', type=int, default=40)
    ap.add_argument('--out', default='datasets/mt30_medium')
    ap.add_argument('--chunk-eps', type=int, default=150)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--chunk-offset', type=int, default=0)
    ap.add_argument('--nice', type=int, default=0)
    ap.add_argument('--tasks', nargs='*', default=None)
    args = ap.parse_args()
    if args.nice:
        os.nice(args.nice)

    import jax
    jax.config.update('jax_platforms', 'cpu')  # never contend for the chip

    from tdmpc2_tpu.config import TASK_SET, Config, parse_cfg
    from tdmpc2_tpu.envs import make_env
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    tasks = args.tasks or TASK_SET['mt30']
    task_ids = {t: i for i, t in enumerate(TASK_SET['mt30'])}
    os.makedirs(args.out, exist_ok=True)

    envs, agents = {}, {}
    for t in tasks:
        cfg = parse_cfg(Config(task=t))
        envs[t] = make_env(cfg)
        ckpts = find_checkpoints(t)
        if ckpts:
            # policy-prior acting only (cfg.mpc=False): cheap on CPU, and
            # the prior is what the planner distills into (SURVEY.md §3)
            cfg = cfg.replace(mpc=False)
            cfg.obs_shape = {'state': envs[t].observation_space.shape}
            cfg.action_dim = envs[t].action_space.shape[0]
            cfg.episode_length = envs[t].max_episode_steps
            ags = []
            for fp in ckpts:
                a = TDMPC2(cfg)
                try:
                    extra = a.load(fp)
                except (ValueError, KeyError) as e:
                    # e.g. a pixels (rgb) checkpoint of the same task — not
                    # usable for state-mode collection; fall back to random
                    print(f'{t}: skipping {fp}: {e}', flush=True)
                    continue
                ags.append(a)
                print(f'{t}: policy from {fp} '
                      f'(step {extra.get("step", "?")})', flush=True)
            if ags:
                agents[t] = ags
    obs_dim = max(e.observation_space.shape[0] for e in envs.values())
    act_dim = max(e.action_space.shape[0] for e in envs.values())
    rows = max(e.max_episode_steps for e in envs.values()) + 1
    print(f'{len(tasks)} tasks ({len(agents)} with policies), padded '
          f'obs_dim={obs_dim} act_dim={act_dim} rows={rows}', flush=True)

    rng = np.random.default_rng(args.seed)
    buf, chunk_idx, n_total = [], args.chunk_offset, 0
    t_start = time.time()
    returns = {t: [] for t in tasks}

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

    for ep_i in range(args.episodes_per_task):
        for t in tasks:
            env = envs[t]
            a_dim = env.action_space.shape[0]
            ep_len = env.max_episode_steps
            agent, noise = None, None
            if t in agents:
                noise = NOISE_CYCLE[ep_i % len(NOISE_CYCLE)]
                if noise is not None:
                    agent = agents[t][ep_i % len(agents[t])]
            obs_l, act_l, rew_l = [], [], []
            obs = env.reset()
            obs_l.append(obs)
            act_l.append(np.full(act_dim, np.nan, np.float32))
            rew_l.append(0.0)
            done, first = False, True
            while not done:
                if agent is not None:
                    a = agent.act(obs, t0=first, eval_mode=False)
                    if noise:
                        a = a + noise * rng.standard_normal(a_dim)
                    a = np.clip(a, -1, 1).astype(np.float32)
                else:
                    a = rng.uniform(-1, 1, a_dim).astype(np.float32)
                first = False
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
            returns[t].append(float(np.nansum(rew_l)))
            buf.append(dict(obs=o, action=a, reward=r,
                            task=np.int32(task_ids[t])))
            n_total += 1
            if len(buf) >= args.chunk_eps:
                flush()
    flush()
    Path(args.out, '.complete').touch()  # queue scripts gate on this
    print(f'done: {n_total} episodes -> {args.out} '
          f'in {time.time() - t_start:.0f}s')
    for t in tasks:
        tag = 'policy' if t in agents else 'random'
        print(f'  {t:28s} [{tag}] return mean {np.mean(returns[t]):8.1f} '
              f'min {np.min(returns[t]):8.1f} max {np.max(returns[t]):8.1f}')


if __name__ == '__main__':
    main()
