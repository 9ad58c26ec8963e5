"""Vectorized single-task online trainer (cfg.num_envs > 1).

Batched-actor variant of the online loop: N env copies stepped together,
one fused batched `act` per vector step, N gradient updates per vector step
(preserving the reference's 1-update-per-env-step replay ratio, reference:
tdmpc2/trainer/online_trainer.py:115-122). Episode semantics are preserved
per env copy: each env contributes its own episodes (with the NaN bootstrap
row) to the replay buffer. Fixed-length (non-episodic) tasks only — all env
copies share episode boundaries.
"""

from __future__ import annotations

import numpy as np

from tdmpc2_tpu.trainer.online import OnlineTrainer


class VecOnlineTrainer(OnlineTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert not self.cfg.episodic, (
            'VecOnlineTrainer supports fixed-length (non-episodic) tasks; '
            'use num_envs=1 for episodic tasks.')
        self._n = self.env.num_envs

    def eval(self):
        """Evaluate all env copies in parallel: one batched greedy rollout
        covers num_envs eval episodes (fixed-length tasks keep the copies in
        lockstep), repeated until cfg.eval_episodes is met."""
        import math as _math
        n = self._n
        rewards, successes, lengths = [], [], []
        for r in range(_math.ceil(self.cfg.eval_episodes / n)):
            obs = self.env.reset()
            if self.logger.video:
                self.logger.video.init(self.env.envs[0], enabled=(r == 0))
            ep_reward, t, done = np.zeros(n), 0, False
            while not done:
                actions = self.agent.act(obs, t0=(t == 0), eval_mode=True)
                obs, rews, dones, infos = self.env.step(actions)
                ep_reward += rews
                t += 1
                done = bool(dones[0])
                if self.logger.video:
                    self.logger.video.record(self.env.envs[0])
            rewards.extend(ep_reward.tolist())
            successes.extend(i.get('success', 0.0) for i in infos)
            lengths.extend([t] * n)
            if self.logger.video:
                self.logger.video.save(self._step)
        return dict(episode_reward=float(np.nanmean(rewards)),
                    episode_success=float(np.nanmean(successes)),
                    episode_length=float(np.nanmean(lengths)))

    def _start_episodes(self, obs):
        n = self._n
        a_shape = self.env.action_space.shape
        self._ep_obs = [[np.asarray(obs[i])] for i in range(n)]
        self._ep_action = [[np.full(a_shape, np.nan, np.float32)] for _ in range(n)]
        self._ep_reward = [[np.nan] for _ in range(n)]
        self._ep_terminated = [[np.nan] for _ in range(n)]

    def _record_steps(self, obs, actions, rewards, infos):
        for i in range(self._n):
            self._ep_obs[i].append(np.asarray(obs[i]))
            self._ep_action[i].append(np.asarray(actions[i], np.float32))
            self._ep_reward[i].append(float(rewards[i]))
            self._ep_terminated[i].append(float(infos[i]['terminated']))

    def _flush_episodes(self):
        for i in range(self._n):
            self._ep_idx = self.buffer.add(dict(
                obs=np.stack(self._ep_obs[i]),
                action=np.stack(self._ep_action[i]),
                reward=np.asarray(self._ep_reward[i], np.float32),
                terminated=np.asarray(self._ep_terminated[i], np.float32),
                valid_rows=len(self._ep_obs[i])))

    def train(self):
        cfg = self.cfg
        n = self._n
        train_metrics, done, eval_next = {}, True, False
        next_eval_at = 0
        while self._step <= cfg.steps:
            if self._step >= next_eval_at:
                eval_next = True
                next_eval_at += cfg.eval_freq

            if done:
                if eval_next:
                    eval_metrics = self.eval()
                    eval_metrics.update(self.common_metrics())
                    self.logger.log(eval_metrics, 'eval')
                    eval_next = False
                    self._checkpoint()

                if self._step > 0:
                    ep_rewards = [np.nansum(r[1:]) for r in self._ep_reward]
                    train_metrics.update(
                        episode_reward=float(np.mean(ep_rewards)),
                        episode_success=float(np.mean(
                            [i.get('success', 0.0) for i in infos])),
                        episode_length=len(self._ep_obs[0]) - 1,
                        num_episodes=n)
                    train_metrics.update(self.common_metrics())
                    self.logger.log(train_metrics, 'train')
                    self._flush_episodes()

                obs = self.env.reset()
                self._start_episodes(obs)
                t_in_ep = 0

            if self._step > cfg.seed_steps:
                actions = self.agent.act(obs, t0=(t_in_ep == 0))
            else:
                actions = self.env.rand_act()
            obs, rewards, dones, infos = self.env.step(actions)
            self._record_steps(obs, actions, rewards, infos)
            assert all(d == dones[0] for d in dones), (
                'env copies diverged in episode length')
            done = bool(dones[0])
            t_in_ep += 1

            # With n envs, the first episodes flush at step n*episode_length,
            # which can be later than seed_steps — wait for buffered data.
            if self._step >= cfg.seed_steps and self.buffer.num_eps > 0:
                if not getattr(self, '_pretrained', False):
                    self._pretrained = True
                    print('Pretraining agent on seed data...')
                    for _ in range(cfg.seed_steps // n):
                        _train_metrics = self.agent.update_many(self.buffer, n)
                    for _ in range(cfg.seed_steps % n):
                        _train_metrics = self.agent.update(self.buffer)
                else:
                    # n updates (1 per env step) fused into one device call
                    _train_metrics = self.agent.update_many(self.buffer, n)
                train_metrics.update(_train_metrics)

            self._step += n

        self.logger.finish(self.agent)
