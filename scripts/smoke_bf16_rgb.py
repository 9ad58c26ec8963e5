#!/usr/bin/env python
"""Hardware smoke + A/B for the bf16-compute PIXEL update path.

The pixels online loop is device-update-bound (docs/PERFORMANCE.md,
session 4): 16 conv-heavy updates per vec-step execute ahead of each plan.
cfg.bf16_update now covers the rgb conv encoder (world_model.encode passes
compute_dtype through), halving its activation HBM traffic. This script
runs the real walker-rgb geometry (9x64x64, 5M agent, batch 256) on the
actual chip and reports ms/update for fp32 vs bf16 plus loss deltas, so a
queued pixel run can flip bf16_update=true on measured evidence.

Run ONLY on an idle chip (one TPU process at a time — CLAUDE.md).

Usage: timeout 600 python scripts/smoke_bf16_rgb.py [n_updates]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


TINY = '--tiny' in sys.argv   # CPU wiring check: small dims + batch


def make_agent(bf16: bool):
    from tdmpc2_tpu.config import Config, parse_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2
    kw = dict(num_channels=4, latent_dim=64, mlp_dim=32, enc_dim=32,
              num_q=2, batch_size=8) if TINY else {}
    cfg = parse_cfg(Config(task='walker-walk', obs='rgb',
                           bf16_update=bf16, **kw))
    cfg.obs_shape = {'rgb': (9, 64, 64)}
    cfg.action_dim = 6
    cfg.episode_length = 500
    return TDMPC2(cfg)


def batch_for(cfg, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    T, B = cfg.horizon, cfg.batch_size
    obs = rng.integers(0, 256, (T + 1, B, 9, 64, 64), dtype=np.uint8)
    return (jnp.asarray(obs),
            jnp.asarray(rng.uniform(-1, 1, (T, B, 6)), jnp.float32),
            jnp.asarray(rng.standard_normal((T, B, 1)) * 0.1, jnp.float32),
            jnp.zeros((T, B, 1), jnp.float32))


def time_updates(agent, batch, n, trials=3):
    """NOTE: on the tunneled backend block_until_ready does not actually
    block (scripts/profile_pixel_update.py) — every trial chains updates
    through the carried state and ends with a host scalar fetch, which
    forces the full chain."""
    import jax
    upd = jax.jit(agent._update)
    st, info = upd(agent.state, *batch)          # compile
    float(info['total_loss'])
    best = float('inf')
    for _ in range(trials):
        start = time.perf_counter()
        for _ in range(n):
            st, info = upd(st, *batch)
        float(info['total_loss'])
        best = min(best, (time.perf_counter() - start) / n)
    return best, {k: float(info[k]) for k in
                  ('total_loss', 'consistency_loss', 'reward_loss',
                   'value_loss', 'grad_norm')}


def main():
    import jax
    if TINY:
        jax.config.update('jax_platforms', 'cpu')
    args = [a for a in sys.argv[1:] if a != '--tiny']
    n = int(args[0]) if args else 30
    print(f'backend: {jax.default_backend()}  devices: {jax.devices()}')

    results = {}
    for name, bf16 in (('fp32', False), ('bf16', True)):
        agent = make_agent(bf16)
        batch = batch_for(agent.cfg)
        ms, info = time_updates(agent, batch, n)
        results[name] = (ms, info)
        print(f'{name}: {ms * 1e3:8.2f} ms/update  '
              f'({1.0 / ms:6.1f}/s)  total_loss={info["total_loss"]:.4f}')
        for k, v in info.items():
            assert np.isfinite(v), (name, k, v)

    fp_ms, fp_info = results['fp32']
    bf_ms, bf_info = results['bf16']
    print(f'speedup: {fp_ms / bf_ms:.3f}x')
    for k in fp_info:
        a, b = fp_info[k], bf_info[k]
        rel = abs(a - b) / max(abs(a), 1.0)
        print(f'  {k}: fp32={a:.4f} bf16={b:.4f} rel={rel:.4f}')
        if rel > 0.1:
            print(f'  WARNING: {k} diverges >10% — inspect before enabling')
            sys.exit(1)
    print('OK')


if __name__ == '__main__':
    main()
