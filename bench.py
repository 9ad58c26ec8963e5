#!/usr/bin/env python
"""Benchmark: planner + update throughput of the default 5M agent on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric is planner throughput (MPPI plans/s, i.e. `act` calls/s with
the full 6-iteration x 512-sample x horizon-3 planning kernel + host<->device
action transfer — the per-env-step inference fast path, reference
tdmpc2/tdmpc2.py:97-120). The reference publishes no throughput numbers
(SURVEY.md §6); BASELINE.json's target is ">=10x planner throughput per chip"
vs the reference. The denominator is a DERIVED BOUND, not a measurement:
state-based DMControl training with the reference is commonly reported at
~1M env steps per ~12 h on one GPU, which bounds its act+update loop at
<= ~23 steps/s; planning alone is therefore >= ~23 plans/s but of that order.
We use 40 plans/s as a generous round-up of that bound. `vs_baseline` is
plans_per_s / 40; the >=10x target corresponds to vs_baseline >= 10, and the
margin (~280x) absorbs an order-of-magnitude error in the estimate. Secondary numbers (update steps/s) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    from tdmpc2_tpu.train import _enable_compilation_cache
    _enable_compilation_cache()   # reuse planner/update executables across
    # processes (the whole-CEM Pallas kernel's first Mosaic compile is slow;
    # the queue's smoke job pre-warms this cache at identical geometry)
    import jax.numpy as jnp
    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    obs_dim = cfg.obs_shape['state'][0]
    plan = agent._plan_jit[False]

    obs = jnp.zeros((1, obs_dim), jnp.float32)
    prev_mean = agent.state.prev_mean[0]
    key = agent.state.key
    t0 = jnp.asarray(False)
    # cached fused-kernel weight prep, exactly as act()/evaluate use it
    # (recomputed only when params change — params are fixed here)
    prep = agent._cached_prep(None)

    # -- planner throughput (sequential, state-chained like a real env loop;
    #    best of several trials to reject tunnel-latency noise)
    a, prev_mean, key = plan(
        agent.state.params, obs, prev_mean, t0, key, None, prep)
    jax.block_until_ready(a)  # compile
    n_plan, trials = 200, 4
    plans_per_s = 0.0
    for _ in range(trials):
        start = time.perf_counter()
        for _ in range(n_plan):
            a, prev_mean, key = plan(
                agent.state.params, obs, prev_mean, t0, key, None, prep)
        jax.block_until_ready(a)
        plans_per_s = max(plans_per_s, n_plan / (time.perf_counter() - start))

    # -- update throughput (batch 256, horizon 3)
    T, B, A = cfg.horizon, cfg.batch_size, cfg.action_dim
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((T + 1, B, obs_dim)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, A)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32),
    )
    state, info = agent._update_jit(agent.state, *batch)
    jax.block_until_ready(info['total_loss'])  # compile
    n_upd = 100
    updates_per_s = 0.0
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_upd):
            state, info = agent._update_jit(state, *batch)
        jax.block_until_ready(info['total_loss'])
        updates_per_s = max(updates_per_s, n_upd / (time.perf_counter() - start))

    print(f'planner: {plans_per_s:.1f} plans/s | '
          f'update: {updates_per_s:.1f} steps/s | '
          f'device: {jax.devices()[0].platform}', file=sys.stderr)

    baseline_plans_per_s = 40.0  # documented estimate, see module docstring
    print(json.dumps({
        'metric': 'planner_plans_per_s',
        'value': round(plans_per_s, 2),
        'unit': 'plans/s',
        'vs_baseline': round(plans_per_s / baseline_plans_per_s, 3),
    }))


if __name__ == '__main__':
    main()
