"""Configuration system.

Mirrors the reference's Hydra config surface (reference: tdmpc2/config.yaml,
tdmpc2/common/parser.py:29-80, tdmpc2/common/__init__.py:1-60) without a Hydra
dependency: a plain dataclass + YAML file + `key=value` CLI overrides, with the
same knob names so reference recipes translate 1:1.

Quirks preserved from the reference parser:
- string algebra (``steps=5*1000000``) is evaluated (parser.py:44-54)
- ``model_size`` expands via the MODEL_SIZE table (common/__init__.py:1-24),
  with the mt30/19M latent_dim=512 exception (parser.py:67-68)
- multitask detection + task_dim 96-vs-64 exception (parser.py:71-78)
- ``bin_size = (vmax - vmin) / (num_bins - 1)`` (parser.py:59)

The config object is a mutable dataclass; jitted code closes over it at trace
time (the JAX analogue of the reference's cfg->dataclass conversion that avoids
torch.compile graph breaks, parser.py:12-26).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

# Model-size table: parameters (M) -> architecture dims.
# Reference: tdmpc2/common/__init__.py:1-24.
MODEL_SIZE = {
    1: dict(enc_dim=256, mlp_dim=384, latent_dim=128, num_enc_layers=2, num_q=2),
    5: dict(enc_dim=256, mlp_dim=512, latent_dim=512, num_enc_layers=2),
    19: dict(enc_dim=1024, mlp_dim=1024, latent_dim=768, num_enc_layers=3),
    48: dict(enc_dim=1792, mlp_dim=1792, latent_dim=768, num_enc_layers=4),
    317: dict(enc_dim=4096, mlp_dim=4096, latent_dim=1376, num_enc_layers=5, num_q=8),
}

# Multi-task task sets; list order defines the task-embedding index.
# Reference: tdmpc2/common/__init__.py:26-60.
_DMC_19 = [
    'walker-stand', 'walker-walk', 'walker-run', 'cheetah-run', 'reacher-easy',
    'reacher-hard', 'acrobot-swingup', 'pendulum-swingup', 'cartpole-balance',
    'cartpole-balance-sparse', 'cartpole-swingup', 'cartpole-swingup-sparse',
    'cup-catch', 'finger-spin', 'finger-turn-easy', 'finger-turn-hard',
    'fish-swim', 'hopper-stand', 'hopper-hop',
]
_DMC_CUSTOM_11 = [
    'walker-walk-backwards', 'walker-run-backwards', 'cheetah-run-backwards',
    'cheetah-run-front', 'cheetah-run-back', 'cheetah-jump',
    'hopper-hop-backwards', 'reacher-three-easy', 'reacher-three-hard',
    'cup-spin', 'pendulum-spin',
]
_MW_50 = [
    'mw-assembly', 'mw-basketball', 'mw-button-press-topdown',
    'mw-button-press-topdown-wall', 'mw-button-press', 'mw-button-press-wall',
    'mw-coffee-button', 'mw-coffee-pull', 'mw-coffee-push', 'mw-dial-turn',
    'mw-disassemble', 'mw-door-open', 'mw-door-close', 'mw-drawer-close',
    'mw-drawer-open', 'mw-faucet-open', 'mw-faucet-close', 'mw-hammer',
    'mw-handle-press-side', 'mw-handle-press', 'mw-handle-pull-side',
    'mw-handle-pull', 'mw-lever-pull', 'mw-peg-insert-side',
    'mw-peg-unplug-side', 'mw-pick-out-of-hole', 'mw-pick-place',
    'mw-pick-place-wall', 'mw-plate-slide', 'mw-plate-slide-side',
    'mw-plate-slide-back', 'mw-plate-slide-back-side', 'mw-push-back',
    'mw-push', 'mw-push-wall', 'mw-reach', 'mw-reach-wall', 'mw-shelf-place',
    'mw-soccer', 'mw-stick-push', 'mw-stick-pull', 'mw-sweep-into', 'mw-sweep',
    'mw-window-open', 'mw-window-close', 'mw-bin-picking', 'mw-box-close',
    'mw-door-lock', 'mw-door-unlock', 'mw-hand-insert',
]
TASK_SET = {
    'mt30': _DMC_19 + _DMC_CUSTOM_11,
    'mt80': _DMC_19 + _DMC_CUSTOM_11 + _MW_50,
}


@dataclass
class Config:
    """All hyperparameters. Defaults mirror reference tdmpc2/config.yaml:4-91."""

    # environment
    task: str = 'dog-run'
    obs: str = 'state'
    episodic: bool = False

    # evaluation
    checkpoint: Optional[str] = None
    eval_episodes: int = 10
    eval_freq: int = 50_000

    # training
    steps: int = 10_000_000
    batch_size: int = 256
    reward_coef: float = 0.1
    value_coef: float = 0.1
    termination_coef: float = 1.0
    consistency_coef: float = 20.0
    rho: float = 0.5
    lr: float = 3e-4
    enc_lr_scale: float = 0.3
    grad_clip_norm: float = 20.0
    tau: float = 0.01
    discount_denom: float = 5
    discount_min: float = 0.95
    discount_max: float = 0.995
    buffer_size: int = 1_000_000
    exp_name: str = 'default'
    data_dir: Optional[str] = None

    # planning
    mpc: bool = True
    iterations: int = 6
    num_samples: int = 512
    num_elites: int = 64
    num_pi_trajs: int = 24
    horizon: int = 3
    min_std: float = 0.05
    max_std: float = 2.0
    temperature: float = 0.5

    # actor
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    entropy_coef: float = 1e-4

    # critic
    num_bins: int = 101
    vmin: float = -10.0
    vmax: float = 10.0

    # architecture
    model_size: Optional[int] = None
    num_enc_layers: int = 2
    enc_dim: int = 256
    num_channels: int = 32
    mlp_dim: int = 512
    latent_dim: int = 512
    task_dim: int = 96
    num_q: int = 5
    dropout: float = 0.01
    simnorm_dim: int = 8

    # parallelism (no reference counterpart; TPU-native additions)
    mesh_shape: Optional[str] = None     # e.g. "4x2" -> (data=4, model=2); None = single device
    # JAX platform override ('cpu' runs the full CLI off-TPU, e.g. while
    # another process owns the chip); None = environment default
    platform: Optional[str] = None
    # XLA matmul precision for f32 operands: 'default' (fast single-pass
    # bf16 on the MXU), 'high', or 'highest' (full f32, ~3-6x slower)
    matmul_precision: str = 'default'
    # run the UPDATE path's MLP matmuls with bf16 operands (fp32 master
    # weights + fp32 accumulation): halves the HBM weight/activation traffic
    # of the bandwidth-bound training step; planner/acting stay fp32
    bf16_update: bool = False
    # fused Pallas planner-rollout kernel (auto-gated: TPU backend +
    # single-task + non-episodic; falls back to the XLA scan otherwise)
    use_pallas: bool = True
    # number of parallel env copies for vectorized online data collection
    num_envs: int = 1
    # vectorized-env backend: 'subproc' (one worker process per env copy;
    # parallel physics/rendering), 'inproc' (serial host loop), or 'auto'
    # (subproc for render-heavy rgb observations, inproc otherwise)
    vec_mode: str = 'auto'
    # cap on updates fused into one scan dispatch (update_many /
    # update_many_fused): each fused update materializes its full replay
    # batch in HBM, and for pixel batches that is ~151 MB f32 apiece —
    # n=16 next to the 12.3 GB device ring OOMs a 16 GB v5e (measured
    # 2026-08-19), n=8 is proven. 0 = AUTO: a bytes-aware cap computed from
    # the sampled-batch footprint vs free HBM (TDMPC2._auto_update_chunk;
    # resolves to 8 at the measured walker-64px-rgb geometry, uncapped for
    # small state batches); >0 overrides it. Chunked calls consume the same
    # draw stream one sample_many(chunk) at a time (different draws than
    # one sample_many(n), equally uniform).
    update_chunk: int = 0
    # replay ratio: gradient updates per environment step. The reference
    # fixes this at 1 (tdmpc2/trainer/online_trainer.py:115-122); <1 trades
    # sample-efficiency for wall-clock throughput on update-bound geometries
    # (64px rgb: the fused conv update is ~8 ms/step and dominates the
    # collection loop, so 0.5 nearly doubles env-steps/s). Fractional values
    # accrue credit across vector steps (n * ratio per step, integer part
    # dispatched). Honored by the online/vec-online trainers; the fleet
    # trainer and deficit catch-up stay at the reference 1:1.
    update_ratio: float = 1.0
    # after a resume that starts with an EMPTY replay buffer (the buffer is
    # never checkpointed), suppress gradient updates until the restored
    # policy has re-collected this many env steps. Running the normal
    # 1-update-per-step rate against a nearly-empty fresh buffer makes a
    # well-trained value function diverge (observed: walker-rgb resume at
    # 250k, eval 923 -> collection reward 85 within 8k steps, pi-loss -77);
    # a fresh run survives the same ratio only because its policy is still
    # random. The forgone updates are NOT made up afterwards: the
    # checkpoint already carries one update per pre-resume step, and the
    # refill steps REPLACE lost data rather than extend the run. 0 disables.
    resume_refill_steps: int = 25_000
    # >0: checkpoint the most recent K replay episodes next to the model at
    # every eval-boundary save (storage dtypes preserved; state tasks cost
    # ~10 MB, 64px rgb ~6 MB/episode). On resume the snapshot is restored
    # and its steps count toward the refill gate — resuming against an
    # empty buffer destabilizes a trained agent even behind the gate
    # (see data/buffer.py save_snapshot). 0 = off.
    buffer_snapshot_eps: int = 0
    # fused actor-learner step for vectorized collection: plan + replay
    # sample + the step's gradient updates in ONE device dispatch (cuts the
    # per-vec-step host->device round trips from ~4 to 1 on the
    # dispatch-latency-bound single-chip path). Numerics are identical to
    # the unfused act/sample/update sequence (tested); disable to restore
    # separate dispatches (e.g. to overlap host physics with device update
    # time on a low-latency local chip).
    fused_step: bool = True
    # pipelined collection schedule (only with fused_step): the plan is its
    # own dispatch (+ action fetch) and the sample+update dispatch is issued
    # asynchronously BEFORE the env step, so the update executes on device
    # while the host runs physics/rendering. One extra ~0.3 ms dispatch per
    # vector step buys back the physics time the one-dispatch megastep
    # serializes — a win whenever env stepping costs more than the dispatch
    # (state tasks ~+10-15%; render-heavy pixels more). false = the
    # one-dispatch megastep.
    overlap_update: bool = True
    # replay storage placement: 'auto' (2.5x-bytes-fit heuristic, reference
    # buffer.py:62), 'device' (force HBM), 'host' (force RAM + prefetch)
    buffer_device: str = 'auto'

    # fault tolerance / observability (no reference counterpart)
    resume: bool = False            # resume online training from the latest
                                    # full-state checkpoint in work_dir
    profiler_port: Optional[int] = None  # jax.profiler trace server port
    profile_dir: Optional[str] = None    # write a program trace of the first
                                         # post-warmup updates here

    # logging
    wandb_project: Optional[str] = None
    wandb_entity: Optional[str] = None
    wandb_silent: bool = False
    enable_wandb: bool = False
    save_csv: bool = True

    # misc
    compile: bool = True   # kept for config-surface parity; JAX always jits
    save_video: bool = False
    save_agent: bool = True
    seed: int = 1
    # fleet training: 'seeds=1,2,3' trains K seeds of the task simultaneously
    # in ONE process (seed-stacked TrainState, fused act/update/replay across
    # seeds — tdmpc2_tpu/fleet.py). Single-task online, state obs only.
    seeds: Any = None

    # convenience — filled by parse_cfg / env factory (reference's `???` fields)
    work_dir: Optional[str] = None
    task_title: Optional[str] = None
    multitask: Optional[bool] = None
    tasks: Any = None
    obs_shape: Any = None           # dict: obs-kind -> shape tuple
    action_dim: Optional[int] = None
    episode_length: Optional[int] = None
    obs_shapes: Any = None          # multitask: per-task obs dims
    action_dims: Any = None         # multitask: per-task action dims
    episode_lengths: Any = None     # multitask: per-task episode lengths
    seed_steps: Optional[int] = None
    bin_size: Optional[float] = None

    def get(self, key, default=None):
        return getattr(self, key, default)

    def replace(self, **kwargs) -> 'Config':
        return dataclasses.replace(self, **kwargs)


_ALGEBRA_RE = re.compile(r"^(\d+)([+\-*/])(\d+)$")


def _coerce(key: str, value: str) -> Any:
    """Coerce a CLI string override to the right python type."""
    # string algebra, e.g. steps=5*1000000 (reference parser.py:44-54)
    m = _ALGEBRA_RE.match(value)
    if m:
        out = eval(m.group(1) + m.group(2) + m.group(3))  # noqa: S307 — digits only
        if isinstance(out, float) and out.is_integer():
            out = int(out)
        return out
    low = value.lower()
    if low in ('true', 'yes'):
        return True
    if low in ('false', 'no'):
        return False
    if low in ('none', 'null'):
        return None
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


def parse_overrides(args) -> dict:
    """Parse a list of 'key=value' CLI overrides."""
    out = {}
    for a in args:
        if '=' not in a:
            raise ValueError(f"Override '{a}' is not of the form key=value")
        k, v = a.split('=', 1)
        out[k.strip()] = _coerce(k, v) if isinstance(v, str) else v
    return out


def parse_cfg(cfg: Config) -> Config:
    """Fill derived fields; mirrors reference parse_cfg (parser.py:29-80)."""
    # string algebra on any string-typed numeric field
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if isinstance(v, str):
            m = _ALGEBRA_RE.match(v)
            if m:
                setattr(cfg, f.name, _coerce(f.name, v))

    cfg.work_dir = str(Path.cwd() / 'logs' / cfg.task / str(cfg.seed) / cfg.exp_name)
    cfg.task_title = cfg.task.replace('-', ' ').title()
    cfg.bin_size = (cfg.vmax - cfg.vmin) / (cfg.num_bins - 1)

    if cfg.model_size is not None:
        if cfg.model_size not in MODEL_SIZE:
            raise ValueError(
                f'Invalid model size {cfg.model_size}. Must be one of {list(MODEL_SIZE)}')
        for k, v in MODEL_SIZE[cfg.model_size].items():
            setattr(cfg, k, v)
        if cfg.task == 'mt30' and cfg.model_size == 19:
            cfg.latent_dim = 512  # published mt30/19M checkpoint quirk (parser.py:67-68)

    cfg.multitask = cfg.task in TASK_SET
    if cfg.multitask:
        cfg.task_title = cfg.task.upper()
        # task_dim inconsistency across published mt experiments (parser.py:75)
        cfg.task_dim = 96 if (cfg.task == 'mt80' or (cfg.model_size or 5) in (1, 317)) else 64
    else:
        cfg.task_dim = 0
    cfg.tasks = TASK_SET.get(cfg.task, [cfg.task])
    return cfg


def load_cfg(yaml_path: Optional[str] = None, overrides=()) -> Config:
    """Build a Config from optional YAML file + CLI overrides, then parse."""
    cfg = Config()
    values = {}
    if yaml_path:
        import yaml
        with open(yaml_path) as f:
            values.update(yaml.safe_load(f) or {})
    values.update(parse_overrides(list(overrides)))
    known = {f.name for f in dataclasses.fields(Config)}
    for k, v in values.items():
        if k not in known:
            raise ValueError(f'Unknown config key: {k}')
        setattr(cfg, k, v)
    return parse_cfg(cfg)
