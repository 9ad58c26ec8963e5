#!/usr/bin/env python
"""Benchmark: planner + update throughput of the default 5M agent on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric is DEVICE-BOUND planner throughput: K sequential MPPI plans
(6 iterations x 512 samples x horizon 3, state threaded plan-to-plan exactly
like a real env/eval loop — reference tdmpc2/tdmpc2.py:97-120) chained inside
ONE jitted `lax.scan`, so one host->device dispatch amortizes over K plans and
the measurement reflects chip time, not tunnel round-trips.

Why: this box reaches its single TPU chip through a tunnel whose per-dispatch
overhead is weather-dependent (~90 us one night, ~800 us another). The
round-2 committed number (1,353 plans/s) was exactly that: all planner modes
measured ~0.8 ms/plan on an idle chip because each plan was its own dispatch
— per-call throughput is a tunnel RTT benchmark, not a planner benchmark.
Three numbers are now reported so a degraded capture is self-identifying:
  - planner_plans_per_s  (primary): device-bound, in-jit K-plan chain
  - per_call_plans_per_s (extra):   one dispatch per plan, async-chained
  - dispatch_us          (extra):   measured per-dispatch overhead (RTT probe)
If per_call ~= 1e6/dispatch_us, the per-call number is dispatch-bound and the
device-bound number is the real planner speed.

The reference publishes no throughput numbers (SURVEY.md par.6);
BASELINE.json's target is ">=10x planner throughput per chip" vs the
reference. The denominator is a DERIVED BOUND, not a measurement: state-based
DMControl training with the reference is commonly reported at ~1M env steps
per ~12 h on one GPU, which bounds its act+update loop at <= ~23 steps/s;
planning alone is therefore >= ~23 plans/s but of that order. We use
40 plans/s as a generous round-up of that bound. `vs_baseline` is
plans_per_s / 40; the >=10x target corresponds to vs_baseline >= 10.
Secondary numbers (update steps/s, per-mode shootout with `--modes`) go to
stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

try:
    import numpy as np
except ModuleNotFoundError:  # pragma: no cover — environment guard
    # The 2026-08-20 container reset left bare `python` resolving to a
    # package-less /usr/local interpreter (the stack lives in /opt/venv,
    # which nothing on PATH activates). Re-exec under the venv so driver
    # invocations of `python bench.py` keep working.
    # NB: /opt/venv/bin/python is a SYMLINK to the same base binary (what
    # differs is sys.prefix via pyvenv.cfg), so compare prefixes and use a
    # one-shot env marker against exec loops.
    _venv = '/opt/venv/bin/python'
    if (os.path.exists(_venv) and sys.prefix != '/opt/venv'
            and not os.environ.get('TDMPC2_TPU_BENCH_REEXEC')):
        os.environ['TDMPC2_TPU_BENCH_REEXEC'] = '1'
        os.execv(_venv, [_venv] + sys.argv)
    raise


QUICK = bool(os.environ.get('BENCH_QUICK'))  # tiny sizes for CPU CI smoke


def _time_best(fn, trials=4):
    """Best-of-N wall time of fn() (tunnel timing is ~2x noisy run-to-run)."""
    best = float('inf')
    for _ in range(2 if QUICK else trials):
        start = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - start)
    return best


def make_megastep_fixture(cfg, n_envs, rng):
    """Agent + device-resident buffer (3 synthetic episodes with the NaN
    bootstrap row) + obs/t0 arrays for timing `TDMPC2.vec_step` at bench
    geometry. Shared with scripts/profile_step.py so the profiler measures
    exactly the program the bench reports. Setup banners go to stderr."""
    import contextlib

    from tdmpc2_tpu.data.buffer import Buffer
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg_b = cfg.replace(num_envs=n_envs, buffer_device='device')
    obs_dim = cfg_b.obs_shape['state'][0]
    a_dim = cfg_b.action_dim
    with contextlib.redirect_stdout(sys.stderr):
        agent = TDMPC2(cfg_b)
        buf = Buffer(cfg_b)
        rows = cfg_b.episode_length + 1
        for _ in range(3):
            ep_a = rng.uniform(-1, 1, (rows, a_dim)).astype(np.float32)
            ep_r = rng.uniform(0, 1, rows).astype(np.float32)
            ep_a[0] = np.nan
            ep_r[0] = np.nan
            buf.add(dict(
                obs=rng.standard_normal((rows, obs_dim)).astype(np.float32),
                action=ep_a, reward=ep_r,
                terminated=np.zeros(rows, np.float32)))
    obs_v = np.zeros((n_envs, obs_dim), np.float32)
    t0_v = np.zeros(n_envs, bool)
    return agent, buf, obs_v, t0_v


def main():
    argv = set(sys.argv[1:])
    if os.environ.get('BENCH_CPU'):
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    from tdmpc2_tpu.train import _enable_compilation_cache
    _enable_compilation_cache()   # reuse planner/update executables across
    # processes (the whole-CEM Pallas kernel's first Mosaic compile is slow;
    # queue smoke jobs pre-warm this cache at identical geometry)
    import jax.numpy as jnp
    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    obs_dim = cfg.obs_shape['state'][0]

    obs = jnp.zeros((1, obs_dim), jnp.float32)
    prev_mean = agent.state.prev_mean[0]
    key = agent.state.key
    t0 = jnp.asarray(False)
    # cached fused-kernel weight prep, exactly as act()/evaluate use it
    # (recomputed only when params change — params are fixed here)
    prep = agent._cached_prep(None)

    # -- RTT probe: per-dispatch overhead of this backend/tunnel tonight
    bump = jax.jit(lambda x: x + 1)
    x = bump(jnp.zeros((), jnp.int32))
    jax.block_until_ready(x)
    n_rtt = 20 if QUICK else 200

    def rtt_loop():
        nonlocal x
        for _ in range(n_rtt):
            x = bump(x)
        jax.block_until_ready(x)

    dispatch_us = _time_best(rtt_loop, trials=3) / n_rtt * 1e6

    # -- device-bound planner throughput: K plans inside ONE executable.
    #    Carry (prev_mean, key) threads plan-to-plan; obs is fixed (value
    #    identical to the real loop's work — MPPI cost has no obs dependence).
    K = 4 if QUICK else 100

    def plan_chain(params, obs, pm, k, prep):
        def body(carry, _):
            pm, k = carry
            a, pm, k = agent._plan(params, obs, pm, t0, k, None, prep,
                                   eval_mode=False)
            return (pm, k), a
        (pm, k), actions = jax.lax.scan(body, (pm, k), None, length=K)
        return actions[-1], pm, k

    def measure_chain():
        chain = jax.jit(plan_chain)
        a, pm, k = chain(agent.state.params, obs, prev_mean, key, prep)
        jax.block_until_ready(a)  # compile
        reps = 2 if QUICK else 5

        def loop():
            nonlocal pm, k
            for _ in range(reps):
                a, pm, k = chain(agent.state.params, obs, pm, k, prep)
            jax.block_until_ready(a)

        return K * reps / _time_best(loop)

    plans_per_s = measure_chain()

    # -- per-call planner throughput (one dispatch per plan, async-chained
    #    like the round-1/2 bench; dispatch-bound when the tunnel is slow)
    plan = agent._plan_jit[False]
    a, pm1, k1 = plan(agent.state.params, obs, prev_mean, t0, key, None, prep)
    jax.block_until_ready(a)  # compile
    n_plan = 8 if QUICK else 200

    def per_call_loop():
        nonlocal pm1, k1
        for _ in range(n_plan):
            a, pm1, k1 = plan(agent.state.params, obs, pm1, t0, k1, None, prep)
        jax.block_until_ready(a)

    per_call_plans_per_s = n_plan / _time_best(per_call_loop)

    # -- optional per-mode shootout on DEVICE time (CEM kernel vs fused
    #    value kernel vs plain XLA), each as its own in-jit chain
    if '--modes' in argv:
        avail = [('cem', agent._fused_cem, True),
                 ('rollout', agent._fused_rollout, False),
                 ('xla', True, False)]
        saved = (agent._fused_rollout, agent._fused_cem)
        for name, ok, want_cem in avail:
            if not ok:
                print(f'mode {name:8s}: unavailable (probe failed)',
                      file=sys.stderr)
                continue
            agent._fused_cem = want_cem
            agent._fused_rollout = saved[0] if name != 'xla' else False
            pps = measure_chain()
            print(f'mode {name:8s}: {pps:9.1f} plans/s device-bound '
                  f'({1e6 / pps:7.1f} us/plan)', file=sys.stderr)
        agent._fused_rollout, agent._fused_cem = saved

    # -- update throughput (batch 256, horizon 3)
    T, B, A = cfg.horizon, cfg.batch_size, cfg.action_dim
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((T + 1, B, obs_dim)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, A)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32),
    )
    # device-bound: n updates scanned inside one executable (the same
    # _update_scan_jit the trainers use for fused update bursts)
    n_scan = 2 if QUICK else 16
    batch_scan = tuple(jnp.broadcast_to(b, (n_scan,) + b.shape) for b in batch)
    state, info = agent._update_scan_jit(agent.state, *batch_scan)
    jax.block_until_ready(info['total_loss'])  # compile
    reps_u = 2 if QUICK else 3

    def upd_loop():
        nonlocal state
        for _ in range(reps_u):
            state, info = agent._update_scan_jit(state, *batch_scan)
        jax.block_until_ready(state.scale)

    updates_per_s = n_scan * reps_u / _time_best(upd_loop, trials=3)

    # -- fused actor-learner megastep (vec_step): plan N envs + replay
    #    sample + N updates in ONE dispatch — the vectorized online loop's
    #    steady-state cost (docs/PERFORMANCE.md "Fused actor-learner
    #    megastep"). Measured end-to-end like the trainer uses it: blocking
    #    action fetch each call.
    n_envs = 2 if QUICK else 8
    mega_agent, buf, obs_v, t0_v = make_megastep_fixture(cfg, n_envs, rng)
    mega_agent.vec_step(buf, obs_v, t0_v, n_envs)  # compile
    n_mega = 2 if QUICK else 50

    def mega_loop():
        for _ in range(n_mega):
            mega_agent.vec_step(buf, obs_v, t0_v, n_envs)

    mega_ms = _time_best(mega_loop, trials=3) / n_mega * 1e3
    mega_env_sps = n_envs / (mega_ms / 1e3)

    # per-call update (one dispatch per update)
    state, info = agent._update_jit(state, *batch)
    jax.block_until_ready(info['total_loss'])  # compile
    n_upd = 4 if QUICK else 100

    def upd_call_loop():
        nonlocal state
        for _ in range(n_upd):
            state, info = agent._update_jit(state, *batch)
        jax.block_until_ready(state.scale)

    per_call_updates_per_s = n_upd / _time_best(upd_call_loop, trials=3)

    print(f'planner: {plans_per_s:.1f} plans/s device-bound '
          f'({per_call_plans_per_s:.1f} per-call) | '
          f'update: {updates_per_s:.1f} steps/s device-bound '
          f'({per_call_updates_per_s:.1f} per-call) | '
          f'megastep({n_envs} envs): {mega_ms:.1f} ms '
          f'({mega_env_sps:.0f} env-steps/s) | '
          f'dispatch: {dispatch_us:.0f} us | '
          f'device: {jax.devices()[0].platform} '
          f'({getattr(jax.devices()[0], "device_kind", "?")})',
          file=sys.stderr)

    baseline_plans_per_s = 40.0  # documented estimate, see module docstring
    print(json.dumps({
        'metric': 'planner_plans_per_s',
        'value': round(plans_per_s, 2),
        'unit': 'plans/s',
        'vs_baseline': round(plans_per_s / baseline_plans_per_s, 3),
        'per_call_plans_per_s': round(per_call_plans_per_s, 2),
        'update_steps_per_s': round(updates_per_s, 2),
        'per_call_update_steps_per_s': round(per_call_updates_per_s, 2),
        'megastep_ms': round(mega_ms, 2),
        'megastep_env_steps_per_s': round(mega_env_sps, 1),
        'dispatch_us': round(dispatch_us, 1),
    }))


if __name__ == '__main__':
    main()
