#!/usr/bin/env python
"""Compile + run the fused Pallas planner kernels on the real chip at the
default planner geometry (512 samples, horizon 3, 5M model), then time every
planner mode so the fastest one can be made the default:

  1. whole-CEM-loop kernel   (ops/pallas_cem.py, _fused_cem)
  2. per-iteration value kernel (ops/pallas_rollout.py, _fused_rollout)
  3. pure XLA planner        (use_pallas=false)

Exits non-zero if a probe-enabled kernel fails to lower/compile/execute, so
launch scripts can fall back to `use_pallas=false`."""

import sys
import time

import numpy as np


def _time_plans(agent, cfg, n=200, trials=3):
    """Best-of-N sequential chained plans/s via the same jitted entry
    bench.py uses (single env, train mode)."""
    import jax
    import jax.numpy as jnp
    plan = agent._plan_jit[False]
    obs = jnp.zeros((1, cfg.obs_shape['state'][0]), jnp.float32)
    prev_mean = agent.state.prev_mean[0]
    key = agent.state.key
    t0 = jnp.asarray(False)
    prep = agent._cached_prep(None)
    a, prev_mean, key = plan(
        agent.state.params, obs, prev_mean, t0, key, None, prep)
    jax.block_until_ready(a)  # compile
    assert np.isfinite(np.asarray(a)).all()
    best = 0.0
    for _ in range(trials):
        start = time.perf_counter()
        for _ in range(n):
            a, prev_mean, key = plan(
                agent.state.params, obs, prev_mean, t0, key, None, prep)
        jax.block_until_ready(a)
        best = max(best, n / (time.perf_counter() - start))
    return best


def main():
    import jax
    from tdmpc2_tpu.train import _enable_compilation_cache
    _enable_compilation_cache()   # pre-warm the shared executable cache so
    # bench.py (same planner geometry) skips the slow first Mosaic compile

    if jax.default_backend() != 'tpu':
        print('not on TPU; nothing to smoke-test')
        return 0

    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    assert agent._fused_rollout, 'fused kernel gate unexpectedly off'
    obs = np.zeros((cfg.obs_shape['state'][0],), np.float32)
    a = agent.act(obs, t0=True)
    a2 = agent.act(obs, t0=False)
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(a2)).all()
    # batched acting (vec trainer, num_envs=8): vmapped planner — a separate
    # Mosaic lowering (custom_vmap env-flattening rule); must also run
    cfg8 = _make_cfg(num_envs=8)
    agent8 = TDMPC2(cfg8)
    obs8 = np.zeros((8, cfg.obs_shape['state'][0]), np.float32)
    a8 = agent8.act(obs8, t0=np.ones(8, bool))
    assert a8.shape == (8, cfg.action_dim) and np.isfinite(a8).all()
    print('fused value kernel OK (single + 8-env batched):', np.asarray(a),
          flush=True)

    # ---- timing shoot-out: pick the fastest planner mode -----------------
    rates = {}
    if agent._fused_cem:
        rates['cem_kernel'] = _time_plans(agent, cfg)
    # per-iteration value kernel only (fresh agent: flags are baked into the
    # jitted planner at first trace)
    agent_vk = TDMPC2(cfg)
    agent_vk._fused_cem = False
    rates['value_kernel'] = _time_plans(agent_vk, cfg)
    # pure XLA planner
    cfg_xla = _make_cfg(use_pallas=False)
    agent_xla = TDMPC2(cfg_xla)
    assert not (agent_xla._fused_rollout or agent_xla._fused_cem)
    rates['xla'] = _time_plans(agent_xla, cfg_xla)
    for name, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f'planner mode {name:>12}: {r:8.1f} plans/s', flush=True)
    best = max(rates, key=rates.get)
    print(f'fastest planner mode: {best}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
