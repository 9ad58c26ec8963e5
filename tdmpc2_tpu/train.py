"""Training entry point (reference: tdmpc2/train.py).

Usage:
    python train.py task=walker-walk
    python train.py task=cartpole-balance steps=100000 seed=3
    python train.py task=mt30 model_size=317 data_dir=/path/to/mt30

Multitask configs train offline (OfflineTrainer); everything else trains
online (OnlineTrainer).
"""

from __future__ import annotations

import sys
from pathlib import Path

from tdmpc2_tpu.config import load_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.envs import make_env
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.trainer import OfflineTrainer, OnlineTrainer, VecOnlineTrainer
from tdmpc2_tpu.utils.logger import Logger
from tdmpc2_tpu.utils.seed import set_seed


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat runs skip the ~40 s planner/
    update compiles (safe no-op if unsupported)."""
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir',
                          str(Path.home() / '.cache' / 'tdmpc2_tpu_xla'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def train(cfg):
    assert cfg.steps > 0, 'Must train for at least 1 step.'
    if cfg.platform:
        # must precede every jax op: the backend freezes at first use
        import jax
        jax.config.update('jax_platforms', cfg.platform)
    _enable_compilation_cache()
    if cfg.matmul_precision != 'default':
        import jax
        jax.config.update('jax_default_matmul_precision', cfg.matmul_precision)
    if cfg.profiler_port:
        # live trace server: connect with TensorBoard / xprof
        # (TPU-native observability; the reference has none, SURVEY.md §5.1)
        import jax
        jax.profiler.start_server(int(cfg.profiler_port))
    set_seed(cfg.seed)
    seeds = _parse_seeds(cfg.get('seeds'))
    if seeds is not None and len(seeds) == 1:
        cfg.seed = seeds[0]   # fleet of one == a plain single-seed run
        from tdmpc2_tpu.config import parse_cfg
        parse_cfg(cfg)        # re-derive work_dir for the chosen seed
        seeds = None
    if seeds is not None:
        return _train_fleet(cfg, seeds)
    env = make_env(cfg)
    mesh = None
    if cfg.mesh_shape is not None:
        from tdmpc2_tpu import parallel
        mesh = parallel.make_mesh(cfg.mesh_shape)
        print(f'Device mesh: {dict(mesh.shape)} over {mesh.size} devices')
    agent = TDMPC2(cfg, mesh=mesh)
    buffer = Buffer(cfg)
    logger = Logger(cfg)
    if cfg.multitask:
        cls = OfflineTrainer
    elif int(cfg.get('num_envs') or 1) > 1:
        cls = VecOnlineTrainer
    else:
        cls = OnlineTrainer
    trainer = cls(cfg=cfg, env=env, agent=agent, buffer=buffer, logger=logger)
    trainer.train()
    print('Training completed successfully')


def _parse_seeds(seeds):
    if seeds is None:
        return None
    if isinstance(seeds, int):
        return [seeds]
    if isinstance(seeds, str):
        return [int(s) for s in seeds.replace(' ', '').split(',') if s]
    return [int(s) for s in seeds]


def _train_fleet(cfg, seeds):
    """K-seed fleet training (tdmpc2_tpu/fleet.py): one process, one chip,
    per-seed artifacts identical to K single-seed runs."""
    from tdmpc2_tpu.data.fleet_buffer import FleetBuffer
    from tdmpc2_tpu.envs import make_fleet_env
    from tdmpc2_tpu.fleet import FleetAgent
    from tdmpc2_tpu.trainer.fleet_online import FleetOnlineTrainer

    assert not cfg.multitask, 'fleet training is single-task online'
    env = make_fleet_env(cfg, seeds)
    mesh = None
    if cfg.mesh_shape is not None:
        # multi-chip fleet: seeds are sharded over the 'data' mesh axis
        # (each device owns K/data_size seeds end-to-end, no collectives)
        from tdmpc2_tpu import parallel
        mesh = parallel.make_mesh(cfg.mesh_shape)
        print(f'Fleet mesh: {dict(mesh.shape)} over {mesh.size} devices')
    agent = FleetAgent(cfg, seeds, mesh=mesh)
    buffer = FleetBuffer(cfg, len(seeds), mesh=mesh)
    loggers = []
    for k, s in enumerate(seeds):
        cfg_k = cfg.replace(seed=int(s),
                            work_dir=str(agent.work_dir(k)))
        loggers.append(Logger(cfg_k))
    trainer = FleetOnlineTrainer(cfg=cfg, env=env, agent=agent,
                                 buffer=buffer, loggers=loggers)
    trainer.train()
    print('Training completed successfully')


def main(argv=None):
    cfg = load_cfg(overrides=(argv if argv is not None else sys.argv[1:]))
    train(cfg)


if __name__ == '__main__':
    main()
