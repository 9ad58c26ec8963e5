"""Single-task online RL trainer.

Mirrors the reference loop semantics exactly (reference: tdmpc2/trainer/
online_trainer.py:9-127): random actions for the first `seed_steps`, a
`seed_steps`-sized pretraining burst at the first update, then one gradient
update per environment step; episodes are buffered with a leading bootstrap
row (NaN action/reward); periodic evaluation with optional video.
"""

from __future__ import annotations

from time import time

import numpy as np

from tdmpc2_tpu.trainer.base import Trainer


class OnlineTrainer(Trainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._step = 0
        self._ep_idx = 0
        self._start_time = time()
        self._sps_anchor = 0   # steps already done when this PROCESS started

    def common_metrics(self):
        elapsed = time() - self._start_time
        return dict(step=self._step, episode=self._ep_idx,
                    elapsed_time=elapsed,
                    # resumed runs: rate of THIS session's steps, not the
                    # checkpointed total over this session's wall clock
                    steps_per_second=(self._step - self._sps_anchor)
                    / max(elapsed, 1e-9))

    def eval(self):
        """Evaluate (reference online_trainer.py:28-52)."""
        rewards, successes, lengths = [], [], []
        for i in range(self.cfg.eval_episodes):
            obs, done, ep_reward, t = self.env.reset(), False, 0.0, 0
            if self.logger.video:
                self.logger.video.init(self.env, enabled=(i == 0))
            info = {}
            while not done:
                action = self.agent.act(obs, t0=(t == 0), eval_mode=True)
                obs, reward, done, info = self.env.step(action)
                ep_reward += reward
                t += 1
                if self.logger.video:
                    self.logger.video.record(self.env)
            rewards.append(ep_reward)
            successes.append(info.get('success', 0.0))
            lengths.append(t)
            if self.logger.video:
                self.logger.video.save(self._step)
        return dict(episode_reward=float(np.nanmean(rewards)),
                    episode_success=float(np.nanmean(successes)),
                    episode_length=float(np.nanmean(lengths)))

    def _start_episode(self, obs):
        """Begin an episode row list with the bootstrap row
        (reference online_trainer.py:54-72)."""
        self._ep_obs = [np.asarray(obs)]
        self._ep_action = [np.full(self.env.action_space.shape, np.nan, np.float32)]
        self._ep_reward = [np.nan]
        self._ep_terminated = [np.nan]

    def _record_step(self, obs, action, reward, terminated):
        self._ep_obs.append(np.asarray(obs))
        self._ep_action.append(np.asarray(action, np.float32))
        self._ep_reward.append(float(reward))
        self._ep_terminated.append(float(terminated))

    def _episode_dict(self):
        return dict(
            obs=np.stack(self._ep_obs),
            action=np.stack(self._ep_action),
            reward=np.asarray(self._ep_reward, np.float32),
            terminated=np.asarray(self._ep_terminated, np.float32),
            valid_rows=len(self._ep_obs))

    def maybe_resume(self):
        """Resume from the latest full-state checkpoint (no reference
        counterpart — the reference cannot resume training, SURVEY.md §5.4).
        Restores params/optimizers/scale/RNG and the step counters; replay
        contents are re-collected (the buffer is not checkpointed)."""
        if not self.cfg.resume:
            return
        from pathlib import Path
        fp = Path(self.cfg.work_dir) / 'models' / 'latest.pkl'
        if not fp.exists():
            print('resume=true but no checkpoint found; starting fresh.')
            return
        extra = self.agent.load(str(fp))
        self._step = int(extra.get('step', 0))
        self._ep_idx = int(extra.get('ep_idx', 0))
        self._sps_anchor = self._step
        self._resumed = True
        self._resume_step = self._step
        print(f'Resumed from {fp} at step {self._step:,}.')
        snap = fp.parent / 'buffer.npz'
        if snap.exists():
            try:
                self._refill_credit = self.buffer.load_snapshot(snap)
                print(f'Restored replay snapshot: {self.buffer.num_eps} '
                      f'episodes, {self._refill_credit:,} steps of '
                      'refill credit.')
            except Exception as e:  # noqa: BLE001 — never block a resume
                print(f'Replay snapshot restore failed ({type(e).__name__}: '
                      f'{e}); continuing with an empty buffer.')

    def _refill_done(self):
        """Update gate for the post-resume buffer-refill window: True once
        the restored policy has re-collected cfg.resume_refill_steps env
        steps (always True on a fresh run). See the config field for the
        divergence this prevents."""
        if not getattr(self, '_resumed', False):
            return True
        gate = int(self.cfg.get('resume_refill_steps', 0) or 0)
        credit = getattr(self, '_refill_credit', 0)  # restored snapshot steps
        return self._step - self._resume_step + credit >= gate

    def _updates_due(self, n):
        """Number of gradient updates owed for `n` just-collected env steps
        under cfg.update_ratio (1.0 = the reference's 1-per-step,
        reference online_trainer.py:115-122). Fractional ratios accrue
        credit so e.g. ratio 0.5 at n=16 dispatches 8 every step."""
        r = float(self.cfg.get('update_ratio', 1.0) or 1.0)
        if r == 1.0:
            return n
        self._upd_credit = getattr(self, '_upd_credit', 0.0) + n * r
        k = int(self._upd_credit)
        self._upd_credit -= k
        return k

    def _checkpoint(self):
        self.logger.save_agent(
            self.agent, identifier='latest',
            extra=dict(step=self._step, ep_idx=self._ep_idx))
        k = int(self.cfg.get('buffer_snapshot_eps', 0) or 0)
        if k > 0 and self.buffer.num_eps > 0:
            import os
            from pathlib import Path
            snap = Path(self.cfg.work_dir) / 'models' / 'buffer.npz'
            try:  # atomic: a mid-write kill must not corrupt the snapshot
                self.buffer.save_snapshot(str(snap) + '.tmp', k)
                os.replace(str(snap) + '.tmp', snap)
            except Exception as e:  # noqa: BLE001 — snapshots are best-effort
                print(f'Replay snapshot save failed ({type(e).__name__}: {e})')

    def train(self):
        """Main loop (reference online_trainer.py:74-127)."""
        cfg = self.cfg
        self.maybe_resume()
        train_metrics, done, eval_next = {}, True, False
        info = {}
        while self._step <= cfg.steps:
            if self._step % cfg.eval_freq == 0:
                eval_next = True

            if done:
                if eval_next:
                    eval_metrics = self.eval()
                    eval_metrics.update(self.common_metrics())
                    self.logger.log(eval_metrics, 'eval')
                    eval_next = False
                    self._checkpoint()

                if self._step > 0 and hasattr(self, '_ep_obs'):
                    if info.get('terminated', 0) and not cfg.episodic:
                        raise ValueError(
                            'Termination detected but episodic=false. Set '
                            'episodic=true to enable termination support.')
                    train_metrics.update(
                        episode_reward=float(np.nansum(self._ep_reward[1:])),
                        episode_success=info.get('success', 0.0),
                        episode_length=len(self._ep_obs) - 1,
                        episode_terminated=info.get('terminated', 0.0))
                    train_metrics.update(self.common_metrics())
                    self.logger.log(train_metrics, 'train')
                    self._ep_idx = self.buffer.add(self._episode_dict())

                obs = self.env.reset()
                self._start_episode(obs)

            # collect experience
            if self._step > cfg.seed_steps:
                action = self.agent.act(obs, t0=len(self._ep_obs) == 1)
            else:
                action = self.env.rand_act()
            obs, reward, done, info = self.env.step(action)
            self._record_step(obs, action, reward, info['terminated'])

            # update agent
            if (self._step >= cfg.seed_steps and self.buffer.num_eps > 0
                    and self._refill_done()):
                if self._step == cfg.seed_steps and not getattr(
                        self, '_resumed', False):
                    num_updates = cfg.seed_steps
                    print('Pretraining agent on seed data...')
                else:
                    num_updates = self._updates_due(1)
                if cfg.profile_dir and num_updates == 1 and not getattr(
                        self, '_profiled', False):
                    # one-shot post-warmup device trace (open in TensorBoard)
                    self._profiled = True
                    import jax
                    with jax.profiler.trace(cfg.profile_dir):
                        for _ in range(10):
                            _train_metrics = self.agent.update(self.buffer)
                        jax.block_until_ready(_train_metrics['total_loss'])
                else:
                    _train_metrics = None
                    for _ in range(num_updates):
                        _train_metrics = self.agent.update(self.buffer)
                # keep update metrics as device arrays: float() here would
                # block on the async update dispatch every step (one extra
                # host<->device round trip); Logger.log converts lazily.
                if _train_metrics is not None:  # update_ratio<1: 0-update steps
                    train_metrics.update(_train_metrics)

            self._step += 1

        self.finish()
