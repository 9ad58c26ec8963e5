"""Profile the pixel-observation update path on the real TPU.

Synthetic walker-walk-pixels geometry (obs rgb [9,64,64], action 6, ep 500):
times the replay sampler, single update, fused 8-update scan, and the batched
planner. NOTE: on the tunneled backend `block_until_ready` does not actually
block — every measurement chains device calls and ends with a host scalar
fetch (`float(...)`), which forces the full chain.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.data.buffer import Buffer

import jax


def bench(fn, fetch, n=8, warmup=2):
    """fn() -> out; fetch(out) -> python float (host sync)."""
    for _ in range(warmup):
        fetch(fn())
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    buffer_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    placement = sys.argv[2] if len(sys.argv) > 2 else 'auto'
    cfg = Config(task='walker-walk', obs='rgb', num_envs=8, steps=1_000_000,
                 buffer_size=buffer_size, buffer_device=placement)
    cfg = parse_cfg(cfg)
    cfg.obs_shape = {'rgb': (9, 64, 64)}
    cfg.action_dim = 6
    cfg.episode_length = 250  # will be 500 in the real env; smaller = faster fill
    cfg.seed_steps = 2500

    print('backend:', jax.default_backend(), flush=True)
    agent = TDMPC2(cfg)
    buf = Buffer(cfg)
    rng = np.random.default_rng(0)
    rows = cfg.episode_length + 1
    for _ in range(6):
        buf.add(dict(
            obs=rng.integers(0, 255, (rows, 9, 64, 64), np.uint8),
            action=rng.uniform(-1, 1, (rows, 6)).astype(np.float32),
            reward=rng.uniform(0, 1, (rows,)).astype(np.float32),
            terminated=np.zeros((rows,), np.float32)))
    print('buffer on device:', buf._on_device, flush=True)

    t = bench(lambda: buf.sample(), lambda o: float(o[2][0, 0, 0]))
    print(f'sample(1):              {t*1e3:8.1f} ms', flush=True)
    t = bench(lambda: buf.sample_many(8), lambda o: float(o[2][0, 0, 0, 0]))
    print(f'sample_many(8):         {t*1e3:8.1f} ms', flush=True)

    t = bench(lambda: agent.update(buf), lambda o: float(o['total_loss']))
    print(f'update(1) incl sample:  {t*1e3:8.1f} ms', flush=True)

    t = bench(lambda: agent.update_many(buf, 8),
              lambda o: float(o['total_loss']), n=6)
    print(f'update_many(8):         {t*1e3:8.1f} ms', flush=True)

    # planner: batched act for 8 envs (act returns numpy -> already synced)
    obs = rng.integers(0, 255, (8, 9, 64, 64), np.uint8)
    t = bench(lambda: agent.act(obs, t0=False), lambda o: None)
    print(f'act(8 envs, plan):      {t*1e3:8.1f} ms', flush=True)

    # simulated collection loop: act + update_many(8), no env
    def loop_step():
        a = agent.act(obs, t0=False)
        info = agent.update_many(buf, 8)
        return a, info
    t = bench(lambda: loop_step(), lambda o: float(o[1]['total_loss']), n=6)
    print(f'act+update_many(8):     {t*1e3:8.1f} ms '
          f'(= {8/t:.1f} env-steps/s excl. env)', flush=True)


if __name__ == '__main__':
    main()
