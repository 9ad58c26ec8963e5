"""Vectorized single-task online trainer (cfg.num_envs > 1).

Batched-actor variant of the online loop: N env copies stepped together,
one fused batched `act` per vector step, N gradient updates per vector step
fused into one device call (preserving the reference's 1-update-per-env-step
replay ratio, reference: tdmpc2/trainer/online_trainer.py:115-122).

Episode boundaries are tracked PER ENV SLOT, so episodic (variable-length)
tasks are supported: each slot flushes its own episode (with the NaN
bootstrap row) and is reset individually. The device update is dispatched
BEFORE the env step each iteration — the update consumes replay only, so
host physics/rendering (parallelized across worker processes for rgb,
envs/subproc.py) overlaps the device compute.

Evaluation reuses the training envs; in-progress training episodes are
discarded at eval boundaries (<= num_envs * episode_length of the
eval_freq-step window — only complete episodes ever enter the buffer).
"""

from __future__ import annotations

import numpy as np

from tdmpc2_tpu.trainer.online import OnlineTrainer


class VecOnlineTrainer(OnlineTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._n = self.env.num_envs

    # -- per-slot episode buffers ---------------------------------------------

    def _start_episodes(self, obs):
        n = self._n
        a_shape = self.env.action_space.shape
        self._ep_obs = [[np.asarray(obs[i])] for i in range(n)]
        self._ep_action = [[np.full(a_shape, np.nan, np.float32)] for _ in range(n)]
        self._ep_reward = [[np.nan] for _ in range(n)]
        self._ep_terminated = [[np.nan] for _ in range(n)]

    def _reset_episode_at(self, i, obs_i):
        a_shape = self.env.action_space.shape
        self._ep_obs[i] = [np.asarray(obs_i)]
        self._ep_action[i] = [np.full(a_shape, np.nan, np.float32)]
        self._ep_reward[i] = [np.nan]
        self._ep_terminated[i] = [np.nan]

    def _record_steps(self, obs, actions, rewards, infos):
        for i in range(self._n):
            self._ep_obs[i].append(np.asarray(obs[i]))
            self._ep_action[i].append(np.asarray(actions[i], np.float32))
            self._ep_reward[i].append(float(rewards[i]))
            self._ep_terminated[i].append(float(infos[i]['terminated']))

    def _flush_episode_at(self, i):
        return self.buffer.add(dict(
            obs=np.stack(self._ep_obs[i]),
            action=np.stack(self._ep_action[i]),
            reward=np.asarray(self._ep_reward[i], np.float32),
            terminated=np.asarray(self._ep_terminated[i], np.float32),
            valid_rows=len(self._ep_obs[i])))

    # -- evaluation -------------------------------------------------------------

    def eval(self):
        """Batched greedy evaluation: all env copies run episodes in
        parallel; slots that finish early are reset and excluded until
        cfg.eval_episodes episodes are counted."""
        n = self._n
        rewards, successes, lengths = [], [], []
        while len(rewards) < self.cfg.eval_episodes:
            obs = self.env.reset()
            if self.logger.video:
                self.logger.video.init(self.env, enabled=(len(rewards) == 0))
            ep_reward = np.zeros(n)
            t = np.zeros(n, np.int64)
            active = np.ones(n, bool)
            while active.any():
                actions = self.agent.act(obs, t0=(t == 0), eval_mode=True)
                obs, rews, dones, infos = self.env.step(actions)
                ep_reward += rews * active
                t += 1
                for i in np.flatnonzero(np.asarray(dones) & active):
                    active[i] = False
                    rewards.append(float(ep_reward[i]))
                    successes.append(infos[i].get('success', 0.0))
                    lengths.append(int(t[i]))
                for i in np.flatnonzero(dones):
                    obs[i] = self.env.reset_at(i)
                    t[i] = 0
                if self.logger.video:
                    self.logger.video.record(self.env)
            if self.logger.video:
                self.logger.video.save(self._step)
        return dict(episode_reward=float(np.nanmean(rewards)),
                    episode_success=float(np.nanmean(successes)),
                    episode_length=float(np.nanmean(lengths)))

    # -- training ---------------------------------------------------------------

    def train(self):
        cfg = self.cfg
        n = self._n
        self.maybe_resume()
        train_metrics = {}
        next_eval_at = (self._step // cfg.eval_freq) * cfg.eval_freq
        ep_rewards, ep_successes, ep_lengths, ep_terms = [], [], [], []
        pretrained = getattr(self, '_resumed', False)
        obs = None

        from tdmpc2_tpu.utils.phase import PhaseTimer
        timer = PhaseTimer(steps_per_mark=n)
        fused_ok = True   # trips false if the fused path fails on this
        # backend (e.g. a kernel lowering error) -> unfused dispatches

        while self._step <= cfg.steps:
            if self._step >= next_eval_at:
                eval_metrics = self.eval()
                eval_metrics.update(self.common_metrics())
                self.logger.log(eval_metrics, 'eval')
                self._checkpoint()
                next_eval_at += cfg.eval_freq
                obs = None  # train episodes were interrupted by eval

            if obs is None:
                obs = self.env.reset()
                self._start_episodes(obs)
                t_in_ep = np.zeros(n, np.int64)

            timer.reset()
            use_fused = (cfg.fused_step and fused_ok and pretrained
                         and self._step > cfg.seed_steps
                         and self.buffer.num_eps > 0
                         and self._refill_done())
            if use_fused:
                try:
                    k = self._updates_due(n)  # n unless update_ratio < 1
                    if cfg.overlap_update or k == 0:
                        # pipelined: plan (1 dispatch + fetch), then the
                        # fused sample+update dispatched ASYNC before the
                        # env step so it overlaps host physics/rendering
                        actions = self.agent.act_collect(obs, (t_in_ep == 0))
                        timer.mark('act')
                        if k:
                            train_metrics.update(
                                self.agent.update_many_fused(self.buffer, k))
                        timer.mark('update')
                    else:
                        # one-dispatch megastep: plan + replay sample + k
                        # updates fused (see TDMPC2.vec_step)
                        actions, _tm = self.agent.vec_step(
                            self.buffer, obs, (t_in_ep == 0), k)
                        train_metrics.update(_tm)
                        timer.mark('act')
                except Exception as e:   # degrade, don't kill the run
                    fused_ok = False
                    use_fused = False
                    print(f'[trainer] fused collection path failed '
                          f'({type(e).__name__}: {e}); falling back to '
                          'unfused dispatches')
            if not use_fused:
                if self._step > cfg.seed_steps:
                    actions = self.agent.act(obs, t0=(t_in_ep == 0))
                else:
                    actions = self.env.rand_act()
                timer.mark('act')

                # dispatch the device update BEFORE stepping the envs: it
                # only consumes replay, so host physics/rendering overlaps it
                if (self._step >= cfg.seed_steps and self.buffer.num_eps > 0
                        and self._refill_done()):
                    if not pretrained:
                        pretrained = True
                        print('Pretraining agent on seed data...')
                        for _ in range(cfg.seed_steps // n):
                            _tm = self.agent.update_many(self.buffer, n)
                        for _ in range(cfg.seed_steps % n):
                            _tm = self.agent.update(self.buffer)
                    else:
                        # n updates (1/env-step) fused into one device call
                        k = self._updates_due(n)
                        _tm = self.agent.update_many(self.buffer, k) if k \
                            else None
                    if _tm is not None:
                        train_metrics.update(_tm)
                timer.mark('update')

            obs, rewards, dones, infos = self.env.step(actions)
            timer.mark('env')
            self._record_steps(obs, actions, rewards, infos)
            t_in_ep += 1
            self._step += n

            for i in np.flatnonzero(dones):
                if infos[i].get('terminated', 0) and not cfg.episodic:
                    raise ValueError(
                        'Termination detected but episodic=false. Set '
                        'episodic=true to enable termination support.')
                self._ep_idx = self._flush_episode_at(i)
                ep_rewards.append(float(np.nansum(self._ep_reward[i][1:])))
                ep_successes.append(infos[i].get('success', 0.0))
                ep_lengths.append(len(self._ep_obs[i]) - 1)
                ep_terms.append(infos[i].get('terminated', 0.0))
                obs[i] = self.env.reset_at(i)
                self._reset_episode_at(i, obs[i])
                t_in_ep[i] = 0
            timer.mark('flush')
            timer.step()

            if ep_rewards and (len(ep_rewards) >= n or dones[0]):
                train_metrics.update(
                    episode_reward=float(np.mean(ep_rewards)),
                    episode_success=float(np.mean(ep_successes)),
                    episode_length=float(np.mean(ep_lengths)),
                    episode_terminated=float(np.mean(ep_terms)),
                    num_episodes=len(ep_rewards))
                train_metrics.update(self.common_metrics())
                self.logger.log(train_metrics, 'train')
                ep_rewards, ep_successes, ep_lengths, ep_terms = [], [], [], []

        # final-boundary eval: _step advances n per iteration and can jump
        # past cfg.steps, skipping the eval owed exactly AT the horizon —
        # run it so the exported curve ends at the nominal step count.
        if next_eval_at <= cfg.steps:
            eval_metrics = self.eval()
            eval_metrics.update(self.common_metrics())
            self.logger.log(eval_metrics, 'eval')
            self._checkpoint()

        self.finish()
