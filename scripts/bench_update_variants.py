#!/usr/bin/env python
"""On-chip shootout for the update-path variants (VERDICT r3 'what's weak' #1).

The fused n-update `lax.scan` measured ~20% slower per update than the
donated single-update executable on TPU (docs/PERFORMANCE.md) — an
unexplained carry/aliasing effect. This script times every candidate at
bench geometry (default 5M agent, walker shapes, batch 256) so the winner
can back `update_many`:

  per_call   n donated single-update dispatches (the 1.21 ms/update floor)
  scan       jax.lax.scan over the update body (current update_many)
  scan_u2    the same scan with unroll=2
  scan_u4    the same scan with unroll=4
  fori       jax.lax.fori_loop + dynamic_slice batch indexing
  bf16       scan variant with bf16 matmul compute in the update forward
             pass (cfg.bf16_update), fp32 master weights + fp32 accumulation

Usage: python scripts/bench_update_variants.py [--n 8] [--iters 30] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_best(fn, iters, warmup=3):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=8, help='updates per dispatch')
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    n, results = args.n, {}
    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    obs_dim = cfg.obs_shape['state'][0]
    T, B, A = cfg.horizon, cfg.batch_size, cfg.action_dim
    rng = np.random.default_rng(0)
    batch_n = (
        jnp.asarray(rng.standard_normal((n, T + 1, B, obs_dim)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (n, T, B, A)), jnp.float32),
        jnp.asarray(rng.standard_normal((n, T, B, 1)), jnp.float32),
        jnp.zeros((n, T, B, 1), jnp.float32))
    batch_1 = tuple(x[0] for x in batch_n)

    # -- per_call: n donated dispatches (state threading on device). Each
    # timing pass restarts from a fresh copy of st0 (the donated chain
    # deletes its input buffers); the copy is ~0.1 ms and amortizes over n.
    upd1 = jax.jit(agent._update, donate_argnums=0)
    st0 = agent.state

    def per_call():
        st = jax.tree.map(jnp.copy, st0)
        info = None
        for _ in range(n):
            st, info = upd1(st, *batch_1)
        return info['total_loss']
    results['per_call'] = time_best(per_call, args.iters)

    def scan_fn(unroll):
        def stepped(state, obs, action, reward, terminated):
            def body(st, b):
                return agent._update(st, *b)
            state, infos = jax.lax.scan(
                body, state, (obs, action, reward, terminated),
                unroll=unroll)
            return state, jax.tree.map(lambda x: x[-1], infos)
        return jax.jit(stepped)  # non-donating: re-runnable on st0

    for name, unroll in (('scan', 1), ('scan_u2', 2), ('scan_u4', 4)):
        f = scan_fn(unroll)

        def run(f=f):
            st, info = f(st0, *batch_n)
            return info['total_loss']
        results[name] = time_best(run, args.iters)

    # -- fori_loop with dynamic_slice indexing
    def fori(state, obs, action, reward, terminated):
        def body(i, carry):
            st, _ = carry
            b = tuple(jax.lax.dynamic_index_in_dim(x, i, keepdims=False)
                      for x in (obs, action, reward, terminated))
            st, info = agent._update(st, *b)
            return st, info['total_loss']
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
    fori_jit = jax.jit(fori)

    def run_fori():
        st, loss = fori_jit(st0, *batch_n)
        return loss
    results['fori'] = time_best(run_fori, args.iters)

    # -- bf16 matmul compute in the update forward pass
    if getattr(cfg, 'bf16_update', None) is not None:
        cfg_bf = cfg.replace(bf16_update=True)
        agent_bf = TDMPC2(cfg_bf)
        f = jax.jit(lambda st, *b: agent_bf._update_scan(st, *b))
        st_bf = agent_bf.state

        def run_bf():
            st, info = f(st_bf, *batch_n)
            return info['total_loss']
        results['bf16_scan'] = time_best(run_bf, args.iters)

    dev = jax.devices()[0]
    print(f'device={dev.platform} n={n} batch={B}')
    base = results['per_call'] / n * 1e3
    for k, v in results.items():
        ms = v / n * 1e3
        print(f'  {k:10s} {ms:7.3f} ms/update  '
              f'({n / v:7.1f} updates/s, {ms / base * 100:5.1f}% of per_call)')


if __name__ == '__main__':
    main()
