"""Fleet online trainer: K seeds x N env copies of one task in one process.

No reference counterpart — the reference's 3-seed evidence grid is 3
independent runs per task (results/tdmpc2/*.csv); this trainer produces the
same per-seed artifacts (logs/<task>/<seed>/<exp>/eval.csv + checkpoints, the
exact layout single-seed runs and scripts/export_results.py use) from ONE
process whose device work is fused across seeds: one planner dispatch for all
K x N envs, one update dispatch for all K x N gradient steps, one replay
sample for all K seeds (tdmpc2_tpu/fleet.py, data/fleet_buffer.py).

Reference loop semantics are preserved PER SEED (tdmpc2/trainer/
online_trainer.py:74-127): random actions for the first seed_steps, a
seed_steps pretrain burst at the first update, one gradient update per env
step, episodes buffered with the NaN bootstrap row, per-env-slot episode
boundaries (episodic tasks supported, like trainer/vec_online.py).

Episodic tasks / resumed runs: updates are fused across seeds and gated on
EVERY seed having replay data (buffer.num_eps is the min across seeds), so
gradient updates stall until the slowest seed finishes its first episode —
and on resume the buffer restarts empty, so every resumed session stalls
for one episode too. Because the gate is the min across seeds, the stall is
UNIFORM across seeds: the owed updates form one scalar deficit counter
(`_update_deficit`, always a multiple of N). The trainer accrues it while
the gate is closed and drains it at 2x rate once data exists — an extra
same-shape fused dispatch per step, so no recompilation — restoring the
reference's exact 1:1 update:env-step ratio (tdmpc2/trainer/
online_trainer.py:107-116) within one episode of warmup.
"""

from __future__ import annotations

from time import time

import numpy as np


class FleetOnlineTrainer:
    def __init__(self, cfg, env, agent, buffer, loggers):
        self.cfg = cfg
        self.env = env          # flat K*N env vector (envs.make_fleet_env)
        self.agent = agent      # FleetAgent
        self.buffer = buffer    # FleetBuffer
        self.loggers = loggers  # one Logger per seed
        self.K = agent.K
        self.N = env.num_envs // agent.K
        assert env.num_envs == self.K * self.N
        single = agent.agent    # template TDMPC2 (unstacked param counts)
        print('Agent parameters: '
              f'{single.model.total_params(single.state.params):,} '
              f'x {self.K} seeds')
        self._step = 0                            # per-seed env steps
        self._n_updates = 0                       # per-seed gradient updates
        self._update_deficit = 0                  # owed updates (multiple of N)
        self._ep_idx = np.zeros(self.K, np.int64)
        self._start_time = time()
        self._sps_anchor = 0

    # ----------------------------------------------------------- utilities

    def common_metrics(self, k: int):
        elapsed = time() - self._start_time
        return dict(step=self._step, episode=int(self._ep_idx[k]),
                    elapsed_time=elapsed,
                    # resumed runs: this session's rate (see trainer/online.py)
                    steps_per_second=(self._step - self._sps_anchor)
                    / max(elapsed, 1e-9))

    def _obs_kn(self, obs_flat):
        return np.asarray(obs_flat).reshape(
            (self.K, self.N) + np.asarray(obs_flat).shape[1:])

    # -- per-slot episode buffers (flat index j = k*N + i) -----------------

    def _start_episodes(self, obs_flat):
        kn = self.K * self.N
        a_shape = self.env.action_space.shape
        self._ep_obs = [[np.asarray(obs_flat[j])] for j in range(kn)]
        self._ep_action = [[np.full(a_shape, np.nan, np.float32)]
                           for _ in range(kn)]
        self._ep_reward = [[np.nan] for _ in range(kn)]
        self._ep_terminated = [[np.nan] for _ in range(kn)]

    def _reset_episode_at(self, j, obs_j):
        a_shape = self.env.action_space.shape
        self._ep_obs[j] = [np.asarray(obs_j)]
        self._ep_action[j] = [np.full(a_shape, np.nan, np.float32)]
        self._ep_reward[j] = [np.nan]
        self._ep_terminated[j] = [np.nan]

    def _record_steps(self, obs_flat, actions_flat, rewards, infos):
        for j in range(self.K * self.N):
            self._ep_obs[j].append(np.asarray(obs_flat[j]))
            self._ep_action[j].append(np.asarray(actions_flat[j], np.float32))
            self._ep_reward[j].append(float(rewards[j]))
            self._ep_terminated[j].append(float(infos[j]['terminated']))

    def _episode_rows(self, j):
        rows = self.buffer._rows
        n = len(self._ep_obs[j])

        def padto(x):
            x = np.stack(x).astype(np.float32) if np.ndim(x[0]) else \
                np.asarray(x, np.float32)
            if x.shape[0] < rows:
                pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
                x = np.pad(x, pad)
            return x
        return dict(obs=padto(self._ep_obs[j]),
                    action=padto(self._ep_action[j]),
                    reward=padto(self._ep_reward[j]),
                    terminated=padto(self._ep_terminated[j])), n

    def _flush_seed(self, k, done_slots):
        """Stack seed k's finished episodes into ONE buffer write."""
        eps, valids = [], []
        for j in done_slots:
            ep, n = self._episode_rows(j)
            eps.append(ep)
            valids.append(n)
        block = {key: np.stack([e[key] for e in eps]) for key in eps[0]}
        block['valid_rows'] = np.asarray(valids, np.int32)
        self._ep_idx[k] = self.buffer.add(k, block)

    # ----------------------------------------------------------- resume/ckpt

    def _ckpt_path(self, k):
        return self.agent.work_dir(k) / 'models' / 'latest.pkl'

    def maybe_resume(self):
        if not self.cfg.resume:
            return
        fps = [self._ckpt_path(k) for k in range(self.K)]
        if not all(fp.exists() for fp in fps):
            print('resume=true but not every seed has a checkpoint; '
                  'starting fresh.')
            return
        extras = self.agent.load_seeds(fps)
        steps = [int(e.get('step', 0)) for e in extras]
        self._step = min(steps)
        self._sps_anchor = self._step
        self._ep_idx = np.asarray(
            [int(e.get('ep_idx', 0)) for e in extras], np.int64)
        self._resumed = True
        self._resume_step = self._step
        print(f'Resumed fleet ({self.K} seeds) at step {self._step:,}.')
        snap = self._ckpt_path(0).parent / 'fleet_buffer.npz'
        if snap.exists():
            try:
                self._refill_credit = self.buffer.load_snapshot(snap)
                print(f'Restored fleet replay snapshot '
                      f'({self._refill_credit:,} steps/seed of refill '
                      'credit).')
            except Exception as e:  # noqa: BLE001 — never block a resume
                print(f'Fleet replay snapshot restore failed '
                      f'({type(e).__name__}: {e}); continuing empty.')

    def _refill_done(self):
        """Update/deficit gate for the post-resume buffer-refill window
        (same semantics as OnlineTrainer._refill_done): while the restored
        policies re-collect cfg.resume_refill_steps env steps, no updates
        run AND no deficit accrues — those steps replace data the resume
        lost with the buffer, and the checkpoints already carry their
        updates. Always True on a fresh run, so the episodic lagging-seed
        deficit behavior is unchanged."""
        if not getattr(self, '_resumed', False):
            return True
        gate = int(self.cfg.get('resume_refill_steps', 0) or 0)
        credit = getattr(self, '_refill_credit', 0)  # restored snapshot steps
        return self._step - self._resume_step + credit >= gate

    def _checkpoint(self):
        if not self.cfg.save_agent:
            return
        for k in range(self.K):
            self.agent.save_seed(
                k, self._ckpt_path(k),
                extra=dict(step=self._step, ep_idx=int(self._ep_idx[k])))
        n_snap = int(self.cfg.get('buffer_snapshot_eps', 0) or 0)
        if n_snap > 0 and self.buffer.num_eps > 0:
            import os
            snap = self._ckpt_path(0).parent / 'fleet_buffer.npz'
            try:  # atomic: a mid-write kill must not corrupt the snapshot
                self.buffer.save_snapshot(str(snap) + '.tmp', n_snap)
                os.replace(str(snap) + '.tmp', snap)
            except Exception as e:  # noqa: BLE001 — snapshots are best-effort
                print(f'Fleet replay snapshot save failed '
                      f'({type(e).__name__}: {e})')

    # ------------------------------------------------------------------ eval

    def eval(self):
        """Greedy evaluation, all seeds at once: each seed's N env copies run
        episodes until every seed has cfg.eval_episodes of them. Video (if
        enabled) records seed 0's first env copy — the flat vec env renders
        its slot 0."""
        K, N = self.K, self.N
        video = self.loggers[0].video
        if video is not None and not getattr(self, '_video_noticed', False):
            self._video_noticed = True
            print('Fleet eval records video for seed '
                  f'{self.agent.seeds[0]} only (env slot 0).')
        rewards = [[] for _ in range(K)]
        successes = [[] for _ in range(K)]
        lengths = [[] for _ in range(K)]

        def need():
            return any(len(r) < self.cfg.eval_episodes for r in rewards)

        first_round = True
        while need():
            obs = self.env.reset()
            if video is not None:
                video.init(self.env, enabled=first_round)
            ep_reward = np.zeros(K * N)
            t = np.zeros(K * N, np.int64)
            active = np.ones(K * N, bool)
            while active.any():
                acts = self.agent.act(
                    self._obs_kn(obs), t0=(t == 0).reshape(K, N),
                    eval_mode=True)
                obs, rews, dones, infos = self.env.step(
                    acts.reshape(K * N, -1))
                ep_reward += rews * active
                t += 1
                if video is not None:
                    video.record(self.env)
                for j in np.flatnonzero(np.asarray(dones) & active):
                    active[j] = False
                    k = j // N
                    if len(rewards[k]) < self.cfg.eval_episodes:
                        rewards[k].append(float(ep_reward[j]))
                        successes[k].append(infos[j].get('success', 0.0))
                        lengths[k].append(int(t[j]))
                for j in np.flatnonzero(dones):
                    obs[j] = self.env.reset_at(j)
                    t[j] = 0
            if video is not None and first_round:
                video.save(self._step)
            first_round = False
        return [dict(episode_reward=float(np.nanmean(rewards[k])),
                     episode_success=float(np.nanmean(successes[k])),
                     episode_length=float(np.nanmean(lengths[k])))
                for k in range(K)]

    # ----------------------------------------------------------------- train

    def train(self):
        cfg = self.cfg
        K, N = self.K, self.N
        self.maybe_resume()
        train_metrics = {}
        next_eval_at = (self._step // cfg.eval_freq) * cfg.eval_freq
        ep_stats = [dict(r=[], s=[], l=[], t=[]) for _ in range(K)]
        pretrained = getattr(self, '_resumed', False)
        obs = None

        from tdmpc2_tpu.utils.phase import PhaseTimer
        timer = PhaseTimer(steps_per_mark=N, suffix='env-steps/s per seed')
        fused_ok = True   # trips false if the fused path fails on this
        # backend (e.g. a kernel lowering error) -> unfused dispatches

        while self._step <= cfg.steps:
            if self._step >= next_eval_at:
                for k, em in enumerate(self.eval()):
                    em.update(self.common_metrics(k))
                    self.loggers[k].log(em, 'eval')
                self._checkpoint()
                next_eval_at += cfg.eval_freq
                obs = None  # train episodes were interrupted by eval

            if obs is None:
                obs = self.env.reset()
                self._start_episodes(obs)
                t_in_ep = np.zeros(K * N, np.int64)

            timer.reset()
            use_fused = (cfg.fused_step and fused_ok and pretrained
                         and self._step > cfg.seed_steps
                         and self.buffer.num_eps > 0
                         and self._refill_done())
            if use_fused:
                try:
                    if getattr(cfg, 'overlap_update', True):
                        # pipelined: one plan dispatch for K*N envs
                        # (+ fetch), then the fused K*N-update dispatched
                        # ASYNC before the env step (overlaps host physics)
                        actions = self.agent.act(
                            self._obs_kn(obs),
                            t0=(t_in_ep == 0).reshape(K, N)).reshape(
                            K * N, -1)
                        timer.mark('act')
                        train_metrics.update(
                            self.agent.update_many_fused(self.buffer, N))
                        self._n_updates += N
                        if self._update_deficit > 0:  # catch up at 2x rate
                            train_metrics.update(
                                self.agent.update_many_fused(self.buffer, N))
                            self._update_deficit -= N
                            self._n_updates += N
                        timer.mark('update')
                    else:
                        # one-dispatch megastep: plan + sample + K*N
                        # updates (see FleetAgent.step)
                        actions, _tm = self.agent.step(
                            self.buffer, self._obs_kn(obs),
                            (t_in_ep == 0).reshape(K, N), N)
                        actions = actions.reshape(K * N, -1)
                        train_metrics.update(_tm)
                        self._n_updates += N
                        if self._update_deficit > 0:  # catch up at 2x rate
                            train_metrics.update(
                                self.agent.update_many(self.buffer, N))
                            self._update_deficit -= N
                            self._n_updates += N
                        timer.mark('act')
                except Exception as e:   # degrade, don't kill the run
                    fused_ok = False
                    use_fused = False
                    print(f'[trainer] fused collection path failed '
                          f'({type(e).__name__}: {e}); falling back to '
                          'unfused dispatches')
            if not use_fused:
                if self._step > cfg.seed_steps:
                    actions = self.agent.act(
                        self._obs_kn(obs),
                        t0=(t_in_ep == 0).reshape(K, N)).reshape(K * N, -1)
                else:
                    actions = self.env.rand_act()
                timer.mark('act')

                # dispatch the fused K*N-update BEFORE stepping the envs: it
                # consumes replay only, so host physics overlaps device time
                if self._step >= cfg.seed_steps and self._refill_done():
                    if self.buffer.num_eps > 0:
                        if not pretrained:
                            pretrained = True
                            # owed updates accrued while the slowest seed
                            # finished its first episode join the burst
                            burst = cfg.seed_steps + self._update_deficit
                            self._update_deficit = 0
                            print('Pretraining agents on seed data '
                                  f'({burst} updates/seed)...')
                            for _ in range(burst // N):
                                _tm = self.agent.update_many(self.buffer, N)
                            if burst % N:
                                _tm = self.agent.update_many(
                                    self.buffer, burst % N)
                            self._n_updates += burst
                        else:
                            # N updates/seed (1 per env step), one device call
                            _tm = self.agent.update_many(self.buffer, N)
                            self._n_updates += N
                            if self._update_deficit > 0:  # catch up at 2x
                                _tm = self.agent.update_many(self.buffer, N)
                                self._update_deficit -= N
                                self._n_updates += N
                        train_metrics.update(_tm)
                    else:
                        # gate closed (no episode from the slowest seed yet,
                        # or a resumed session's empty buffer): owe updates
                        self._update_deficit += N
                timer.mark('update')

            obs, rewards, dones, infos = self.env.step(actions)
            timer.mark('env')
            self._record_steps(obs, actions, rewards, infos)
            t_in_ep += 1
            self._step += N

            done_idx = np.flatnonzero(dones)
            for k in range(K):
                slots = [j for j in done_idx if j // N == k]
                if not slots:
                    continue
                for j in slots:
                    if infos[j].get('terminated', 0) and not cfg.episodic:
                        raise ValueError(
                            'Termination detected but episodic=false. Set '
                            'episodic=true to enable termination support.')
                    ep_stats[k]['r'].append(
                        float(np.nansum(self._ep_reward[j][1:])))
                    ep_stats[k]['s'].append(infos[j].get('success', 0.0))
                    ep_stats[k]['l'].append(len(self._ep_obs[j]) - 1)
                    ep_stats[k]['t'].append(infos[j].get('terminated', 0.0))
                self._flush_seed(k, slots)
                for j in slots:
                    obs[j] = self.env.reset_at(j)
                    self._reset_episode_at(j, obs[j])
                    t_in_ep[j] = 0
            timer.mark('flush')
            timer.step()

            if any(len(st['r']) >= N for st in ep_stats) or (
                    dones[0] and ep_stats[0]['r']):
                for k in range(K):
                    if not ep_stats[k]['r']:
                        continue
                    m = dict(train_metrics)
                    m.update(
                        episode_reward=float(np.mean(ep_stats[k]['r'])),
                        episode_success=float(np.mean(ep_stats[k]['s'])),
                        episode_length=float(np.mean(ep_stats[k]['l'])),
                        episode_terminated=float(np.mean(ep_stats[k]['t'])),
                        num_episodes=len(ep_stats[k]['r']))
                    m.update(self.common_metrics(k))
                    self.loggers[k].log(m, 'train')
                    ep_stats[k] = dict(r=[], s=[], l=[], t=[])

        # final-boundary eval: with K*N env steps per iteration, _step jumps
        # from just-below to just-above cfg.steps, so the eval owed AT the
        # horizon (e.g. 400k with eval_freq 50k) would otherwise never run
        # and the exported curve would end one eval_freq short.
        if next_eval_at <= cfg.steps:
            for k, em in enumerate(self.eval()):
                em.update(self.common_metrics(k))
                self.loggers[k].log(em, 'eval')
            self._checkpoint()

        self.finish()

    def finish(self):
        self._checkpoint()
        for lg in self.loggers:
            lg.finish(agent=None)
        if hasattr(self.env, 'close'):
            try:
                self.env.close()
            except Exception:
                pass
