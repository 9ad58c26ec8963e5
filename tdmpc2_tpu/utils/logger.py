"""Console / CSV / (optional) wandb logger + video recorder.

Covers the reference Logger's capabilities (reference: tdmpc2/common/
logger.py:13-241): colored fixed-format console lines per category, an
eval CSV with the published results schema (step,episode_reward[,episode_
success]), best-effort final checkpointing, per-domain multitask aggregation,
and mp4 eval videos. wandb is optional and import-gated (not bundled here).
"""

from __future__ import annotations

import os
from collections import defaultdict
from pathlib import Path

import numpy as np

_CAT_COLOR = {'train': '34', 'eval': '32', 'pretrain': '35', 'bench': '36'}
_PRINT_KEYS = (
    ('iteration', 'I', 'int'),
    ('step', 'S', 'int'),
    ('episode', 'E', 'int'),
    ('episode_reward', 'R', 'float'),
    ('episode_success', 'SR', 'float'),
    ('total_loss', 'L', 'float'),
    ('pi_loss', 'PL', 'float'),
    ('steps_per_second', 'SPS', 'float'),
    ('elapsed_time', 'T', 'time'),
)


def _fmt(value, ty):
    if ty == 'int':
        return f'{int(value):,}'
    if ty == 'time':
        value = float(value)
        if value < 3600:
            return f'{value / 60:.1f}m'
        return f'{value / 3600:.1f}h'
    return f'{float(value):.3f}'


class VideoRecorder:
    """Records eval episode frames and writes mp4 via imageio
    (reference logger.py:78-103)."""

    def __init__(self, work_dir, fps: int = 15, wandb_run=None):
        self._dir = Path(work_dir) / 'videos'
        self.fps = fps
        self.frames = []
        self.enabled = False
        self.wandb_run = wandb_run  # set by Logger after wandb.init

    def init(self, env, enabled: bool = True):
        self.frames = []
        self.enabled = enabled
        self.record(env)

    def record(self, env):
        if self.enabled:
            try:
                self.frames.append(np.asarray(env.render()))
            except Exception:
                self.enabled = False

    def save(self, step: int):
        if not (self.enabled and self.frames):
            return None
        try:
            import imageio
            self._dir.mkdir(parents=True, exist_ok=True)
            try:
                fp = self._dir / f'{step}.mp4'
                imageio.mimsave(str(fp), self.frames, fps=self.fps)
            except Exception:  # no mp4 backend (ffmpeg): fall back to gif
                fp = self._dir / f'{step}.gif'
                imageio.mimsave(str(fp), self.frames, fps=self.fps)
            if self.wandb_run is not None:
                try:  # eval episode video to wandb (reference logger.py:96-103)
                    import wandb
                    frames = np.stack(self.frames).transpose(0, 3, 1, 2)
                    self.wandb_run.log(
                        {'eval_video': wandb.Video(frames, fps=self.fps,
                                                   format='mp4')},
                        step=int(step))
                except Exception:
                    pass
            return fp
        except Exception:
            return None


class Logger:
    def __init__(self, cfg):
        self.cfg = cfg
        self._work_dir = Path(cfg.work_dir or '.')
        self._model_dir = self._work_dir / 'models'
        self._work_dir.mkdir(parents=True, exist_ok=True)
        self._eval_rows = []
        if cfg.get('resume') and (self._work_dir / 'eval.csv').exists():
            # resumed runs keep their eval history (the flush below rewrites
            # the whole file); rows at a re-evaluated step are replaced
            import csv
            with open(self._work_dir / 'eval.csv') as f:
                self._eval_rows = [
                    dict(step=int(r['step']),
                         episode_reward=float(r['episode_reward']),
                         episode_success=float(r.get('episode_success', 0.0)))
                    for r in csv.DictReader(f)]
        self.video = VideoRecorder(self._work_dir) if cfg.save_video else None
        self._wandb = None
        if cfg.enable_wandb and cfg.wandb_project:
            try:
                import wandb
                if cfg.wandb_silent:
                    os.environ['WANDB_SILENT'] = 'true'
                self._wandb = wandb.init(
                    project=cfg.wandb_project, entity=cfg.wandb_entity,
                    name=f'{cfg.task}-{cfg.exp_name}-{cfg.seed}',
                    group=f'{cfg.task}-{cfg.exp_name}',
                    tags=[str(cfg.seed)], config=vars(cfg))
            except Exception as e:
                print(f'wandb unavailable ({e}); continuing without it.')
        if self.video is not None:
            self.video.wandb_run = self._wandb
        self.print_run()

    def print_run(self):
        cfg = self.cfg
        print('=' * 60)
        print(f'  task: {cfg.task_title}   steps: {cfg.steps:,}')
        print(f'  obs: {cfg.obs}   seed: {cfg.seed}   experiment: {cfg.exp_name}')
        print(f'  work dir: {self._work_dir}')
        print('=' * 60)

    def log(self, metrics: dict, category: str = 'train'):
        metrics = {k: (float(v) if hasattr(v, 'item') or isinstance(
            v, (int, float, np.floating, np.integer)) else v)
            for k, v in metrics.items()}
        color = _CAT_COLOR.get(category, '0')
        parts = []
        for key, abbrev, ty in _PRINT_KEYS:
            if key in metrics:
                parts.append(f'{abbrev}: {_fmt(metrics[key], ty)}')
        print(f'\033[{color}m[{category:>8s}]\033[0m ' + '  '.join(parts))
        if self._wandb is not None:
            self._wandb.log(
                {f'{category}/{k}': v for k, v in metrics.items()
                 if isinstance(v, (int, float))},
                step=int(metrics.get('step', metrics.get('iteration', 0))))
        if category == 'eval' and self.cfg.save_csv and 'episode_reward' in metrics:
            step = int(metrics.get('step', metrics.get('iteration', 0)))
            self._eval_rows = [r for r in self._eval_rows if r['step'] != step]
            self._eval_rows.append(
                dict(step=step,
                     episode_reward=float(metrics['episode_reward']),
                     episode_success=float(metrics.get('episode_success', 0.0))))
            self._eval_rows.sort(key=lambda r: r['step'])
            self._flush_csv()

    def _flush_csv(self):
        import csv
        fp = self._work_dir / 'eval.csv'
        with open(fp, 'w', newline='') as f:
            w = csv.DictWriter(
                f, fieldnames=['step', 'episode_reward', 'episode_success'])
            w.writeheader()
            w.writerows(self._eval_rows)

    def pprint_multitask(self, metrics: dict, cfg):
        """Aggregate per-task eval rewards by domain (reference
        logger.py:194-222)."""
        domains = defaultdict(list)
        scores = []
        for k, v in metrics.items():
            if k.startswith('episode_reward+'):
                task = k.split('+', 1)[1]
                domains[task.split('-')[0]].append(v)
                if task.startswith('mw-'):
                    scores.append(metrics.get(f'episode_success+{task}', 0.0) * 100)
                else:
                    scores.append(v / 10)
        print('-' * 40)
        for d, vals in sorted(domains.items()):
            print(f'  {d:<16s} {np.nanmean(vals):8.1f}  ({len(vals)} tasks)')
        if scores:
            print(f'  {"normalized score":<16s} {np.nanmean(scores):8.2f}')
        print('-' * 40)
        return float(np.nanmean(scores)) if scores else 0.0

    def save_agent(self, agent, identifier: str = 'final', extra=None):
        if not self.cfg.save_agent:
            return None
        self._model_dir.mkdir(parents=True, exist_ok=True)
        fp = self._model_dir / f'{identifier}.pkl'
        agent.save(fp, extra=extra)
        if self._wandb is not None:
            try:  # checkpoint artifact to wandb (reference logger.py:155-165)
                import wandb
                cfg = self.cfg
                artifact = wandb.Artifact(
                    f'{cfg.task}-{cfg.exp_name}-{cfg.seed}-{identifier}',
                    type='model')
                artifact.add_file(str(fp))
                self._wandb.log_artifact(artifact)
            except Exception:
                pass
        return fp

    def finish(self, agent=None):
        """Best-effort final checkpoint (reference logger.py:167-173)."""
        try:
            if agent is not None:
                self.save_agent(agent)
        finally:
            if self._wandb is not None:
                self._wandb.finish()
