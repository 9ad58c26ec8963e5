#!/usr/bin/env python
"""Multi-task offline update-step throughput for the 19M/48M/317M models.

Measures the mt30-geometry gradient step (`_update` and the fused
`update_many` scan) on synthetic batches — the hot loop of offline
multi-task training (reference tdmpc2/trainer/offline_trainer.py:75-78,
which publishes no throughput numbers). Reports updates/s and the
parameter-tree HBM footprint per size.

Usage:
    python scripts/bench_mt_update.py [--sizes 19 48 317] [--chunk 8]
        [--platform tpu|cpu] [--mesh 4x2]

With --mesh the update runs data+model sharded on a virtual CPU mesh
(shape-validation only — wall-clock numbers are then meaningless);
without it, single real chip.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(size: int, batch: int, bf16: bool = False):
    from tdmpc2_tpu.config import Config, parse_cfg
    cfg = Config(task='mt30', model_size=size, batch_size=batch,
                 bf16_update=bf16)
    cfg = parse_cfg(cfg)
    # env-derived fields, mt30 geometry (padded obs / action dims as
    # make_multitask_env would produce; reference envs/__init__.py:37-55)
    cfg.obs_shape = {'state': (24,)}
    cfg.action_dim = 6
    cfg.action_dims = [6] * len(cfg.tasks)
    cfg.episode_length = 500
    cfg.episode_lengths = [500] * len(cfg.tasks)
    cfg.seed_steps = 0
    return cfg


def bench_size(size: int, batch: int, chunk: int, mesh=None, bf16=False):
    import jax
    import jax.numpy as jnp
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = build_cfg(size, batch, bf16)
    agent = TDMPC2(cfg, mesh=mesh)
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree.leaves(agent.state.params))
    # params + target Qs + 2 Adam moments, f32
    state_bytes = sum(int(np.prod(np.shape(l))) * 4
                      for l in jax.tree.leaves(agent.state))

    T, B, A = cfg.horizon, cfg.batch_size, cfg.action_dim
    obs_dim = cfg.obs_shape['state'][0]
    rng = np.random.default_rng(0)
    batch_t = (
        jnp.asarray(rng.standard_normal((T + 1, B, obs_dim)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, A)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32),
        jnp.asarray(rng.integers(0, len(cfg.tasks), (B,)), jnp.int32),
    )
    if mesh is not None:
        from tdmpc2_tpu import parallel
        batch_t = parallel.shard_batch(batch_t, mesh)

    state, info = agent._update_jit(agent.state, *batch_t)
    jax.block_until_ready(info['total_loss'])  # compile
    n_upd = 30 if size < 100 else 10
    single = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_upd):
            state, info = agent._update_jit(state, *batch_t)
        jax.block_until_ready(info['total_loss'])
        single = max(single, n_upd / (time.perf_counter() - t0))

    # fused scan over `chunk` pre-drawn batches (offline trainer's fast path)
    many = None
    if chunk > 1:
        scan_batch = tuple(
            jnp.broadcast_to(x, (chunk,) + x.shape) for x in batch_t)
        state, info = agent._update_scan_jit(state, *scan_batch)
        jax.block_until_ready(info['total_loss'])
        many = 0.0
        reps = max(1, n_upd // chunk)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, info = agent._update_scan_jit(state, *scan_batch)
            jax.block_until_ready(info['total_loss'])
            many = max(many, reps * chunk / (time.perf_counter() - t0))

    del agent, state, info, batch_t
    return dict(size=size, params=n_params, state_gb=state_bytes / 2**30,
                updates_per_s=single, fused_updates_per_s=many)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', type=int, nargs='+', default=[19, 48, 317])
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--chunk', type=int, default=8)
    ap.add_argument('--platform', default=None)
    ap.add_argument('--mesh', default=None,
                    help="e.g. 4x2 (data x model) on the virtual CPU mesh")
    ap.add_argument('--bf16', action='store_true',
                    help='bf16-compute update path (cfg.bf16_update)')
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    mesh = None
    if args.mesh:
        from tdmpc2_tpu import parallel
        mesh = parallel.make_mesh(args.mesh)
    print(f'device: {jax.devices()[0].platform} x{len(jax.devices())}'
          f'{f" mesh={args.mesh}" if args.mesh else ""}', file=sys.stderr)

    for size in args.sizes:
        r = bench_size(size, args.batch, args.chunk, mesh, args.bf16)
        fused = (f'{r["fused_updates_per_s"]:8.1f}'
                 if r['fused_updates_per_s'] else '     n/a')
        tag = ' bf16' if args.bf16 else ''
        print(f'mt30 {size:>3}M{tag}: {r["params"]/1e6:7.1f}M params  '
              f'state {r["state_gb"]:5.2f} GiB  '
              f'update {r["updates_per_s"]:8.1f}/s  '
              f'fused(x{args.chunk}) {fused}/s')


if __name__ == '__main__':
    main()
