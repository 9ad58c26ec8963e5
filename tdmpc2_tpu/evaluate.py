"""Evaluation entry point (reference: tdmpc2/evaluate.py).

Usage:
    python evaluate.py task=walker-walk checkpoint=/path/to/agent.pkl
    python evaluate.py task=mt30 model_size=317 checkpoint=...

Loops tasks x eval_episodes with greedy planning; multitask runs report the
normalized score: mean(success*100 for mw-*, return/10 for DMControl)
(reference evaluate.py:93-99).
"""

from __future__ import annotations

import sys

import numpy as np

from tdmpc2_tpu.config import load_cfg
from tdmpc2_tpu.envs import make_env
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.utils.seed import set_seed


def evaluate(cfg):
    assert cfg.checkpoint, 'Must specify a checkpoint to evaluate.'
    if cfg.platform:
        # must precede every jax op: the backend freezes at first use
        import jax
        jax.config.update('jax_platforms', cfg.platform)
    set_seed(cfg.seed)
    env = make_env(cfg)
    agent = TDMPC2(cfg)
    agent.load(cfg.checkpoint)

    scores = []
    tasks = cfg.tasks if cfg.multitask else [cfg.task]
    results = {}

    # multitask + no video: run every task's episodes in LOCKSTEP through
    # the batched-over-tasks planner (one dispatch per eval step for all
    # tasks, ~task-count x faster than the reference's sequential loop,
    # evaluate.py:66-90). Video or pi-only eval uses the sequential path.
    envs = getattr(env, 'envs', None)
    if cfg.multitask and envs is not None and cfg.mpc and not cfg.save_video:
        n = len(envs)
        H, A = cfg.horizon, cfg.action_dim
        a_dims = env.action_dims
        rewards = [[] for _ in range(n)]
        successes = [[] for _ in range(n)]
        for _ in range(cfg.eval_episodes):
            obs = np.stack([env._pad(e.reset()) for e in envs])
            prev_mean = np.zeros((n, H, A), np.float32)
            t0 = np.ones(n, bool)
            active = np.ones(n, bool)
            ep_reward = np.zeros(n)
            while active.any():
                actions, prev_mean = agent.act_tasks(
                    obs, prev_mean, t0, np.arange(n))
                t0[:] = False
                for i in np.flatnonzero(active):
                    o, r, done, info = envs[i].step(actions[i][: a_dims[i]])
                    obs[i] = env._pad(o)
                    ep_reward[i] += r
                    if done:
                        active[i] = False
                        rewards[i].append(float(ep_reward[i]))
                        successes[i].append(info.get('success', 0.0))
        for i, task in enumerate(tasks):
            r, s = float(np.nanmean(rewards[i])), float(np.nanmean(successes[i]))
            results[task] = (r, s)
            print(f'  {task:<28s} R: {r:8.1f}  S: {s:.2f}')
            scores.append(s * 100 if task.startswith('mw-') else r / 10)
        print(f'Normalized score: {np.nanmean(scores):.2f}')
        return results

    for task_idx, task in enumerate(tasks):
        if not cfg.multitask:
            task_idx = None
        rewards, successes = [], []
        for ep in range(cfg.eval_episodes):
            if cfg.multitask:
                obs = env.reset(task_idx)
            else:
                obs = env.reset()
            done, ep_reward, t, info = False, 0.0, 0, {}
            frames = []
            while not done:
                action = agent.act(obs, t0=(t == 0), eval_mode=True, task=task_idx)
                obs, reward, done, info = env.step(action)
                ep_reward += reward
                t += 1
                if cfg.save_video:
                    frames.append(np.asarray(env.render()))
            if cfg.save_video and frames:
                # per-episode video (reference evaluate.py:66-90); falls
                # back to gif when no mp4 backend (ffmpeg) is installed
                import imageio
                from pathlib import Path
                vdir = Path(cfg.work_dir or '.') / 'videos'
                vdir.mkdir(parents=True, exist_ok=True)
                try:
                    imageio.mimsave(
                        str(vdir / f'{task}-{ep}.mp4'), frames, fps=15)
                except Exception:
                    imageio.mimsave(
                        str(vdir / f'{task}-{ep}.gif'), frames, fps=15)
            rewards.append(ep_reward)
            successes.append(info.get('success', 0.0))
        r, s = float(np.nanmean(rewards)), float(np.nanmean(successes))
        results[task] = (r, s)
        print(f'  {task:<28s} R: {r:8.1f}  S: {s:.2f}')
        if cfg.multitask:
            scores.append(s * 100 if task.startswith('mw-') else r / 10)
    if cfg.multitask:
        print(f'Normalized score: {np.nanmean(scores):.2f}')
    return results


def main(argv=None):
    cfg = load_cfg(overrides=(argv if argv is not None else sys.argv[1:]))
    evaluate(cfg)


if __name__ == '__main__':
    main()
