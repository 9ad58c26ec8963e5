"""Whole-CEM-loop Pallas kernel vs the XLA planner loop (interpret mode).

The kernel (ops/pallas_cem.py) replaces `TDMPC2._plan`'s fori_loop when
`agent._fused_cem` is set; these tests force that flag on CPU with the
interpreter and f32 dots, and compare against the stock XLA path on the
same keys — sample noise, terminal eps, Q-head choices, Gumbel pick all
replicate the XLA key-split sequence, so plans must agree to float
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.tdmpc2 import TDMPC2


def _small(cfg):
    cfg.obs_shape = {'state': (10,)}
    cfg.action_dim = 4
    cfg.episode_length = 20
    cfg.enc_dim, cfg.mlp_dim, cfg.latent_dim = 64, 64, 32
    cfg.num_samples, cfg.num_elites, cfg.num_pi_trajs = 64, 8, 8
    cfg.iterations, cfg.num_q = 2, 3
    return cfg


def _make_agent(mode):
    if mode == 'multitask':
        cfg = _small(parse_cfg(Config(task='mt30')))
        cfg.action_dims = [4] * 15 + [2] * 15
        cfg.episode_lengths = [20] * 30
        task = jnp.asarray([20])
    else:
        cfg = _small(parse_cfg(Config(task='toy')))
        cfg.episodic = (mode == 'episodic')
        task = None
    agent = TDMPC2(cfg)
    assert not agent._fused_cem          # CPU -> probes never ran
    return agent, cfg, task


def _plan_args(agent, cfg, seed=7):
    key = jax.random.PRNGKey(seed)
    ko, kp, kk = jax.random.split(key, 3)
    obs = jax.random.normal(ko, (1, cfg.obs_shape['state'][0]))
    prev_mean = 0.1 * jax.random.normal(kp, (cfg.horizon, cfg.action_dim))
    return obs, prev_mean, jnp.asarray(False), kk


def _perturb(params, seed=0):
    """Random-perturb all params (incl. the zero-init reward/Q output heads)
    so sample values are distinct — exact-tie elite sets are compared only
    distributionally (see test_cem_kernel_all_tied_values_finite)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])


@pytest.mark.parametrize('mode', ['single', 'episodic', 'multitask'])
def test_cem_kernel_plan_matches_xla_plan(mode):
    agent, cfg, task = _make_agent(mode)
    params = _perturb(agent.state.params)
    obs, prev_mean, t0, key = _plan_args(agent, cfg)

    a_ref, mean_ref, _ = agent._plan(params, obs, prev_mean, t0, key, task,
                                     eval_mode=True)

    agent._fused_cem = True
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    a_cem, mean_cem, _ = agent._plan(params, obs, prev_mean, t0, key, task,
                                     eval_mode=True)

    np.testing.assert_allclose(np.asarray(mean_cem), np.asarray(mean_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_cem), np.asarray(a_ref),
                               rtol=1e-3, atol=1e-3)


def test_cem_kernel_plan_vec_matches_per_env():
    """Batched acting (`_plan_vec` vmaps `_plan`): the kernel's custom_vmap
    env-to-grid rule must equal per-env planning with the same keys."""
    agent, cfg, task = _make_agent('single')
    agent._fused_cem = True
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    params = _perturb(agent.state.params)

    n = 3
    key = jax.random.PRNGKey(11)
    ko, kp, kk = jax.random.split(key, 3)
    obs = jax.random.normal(ko, (n, cfg.obs_shape['state'][0]))
    prev_mean = 0.1 * jax.random.normal(
        kp, (n, cfg.horizon, cfg.action_dim))
    t0 = jnp.asarray([True, False, False])

    acts, means, _ = agent._plan_vec(params, obs, prev_mean, t0, kk, task,
                                     eval_mode=True)

    keys = jax.random.split(kk, n + 1)
    for i in range(n):
        a_i, m_i, _ = agent._plan(params, obs[i][None], prev_mean[i],
                                  t0[i], keys[i], task, eval_mode=True)
        np.testing.assert_allclose(np.asarray(acts[i]), np.asarray(a_i),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(means[i]), np.asarray(m_i),
                                   rtol=1e-4, atol=1e-4)


def test_cem_kernel_no_pi_trajs():
    """n_pi=0 (pure CEM, no policy-prior rows) must also match XLA."""
    cfg = _small(parse_cfg(Config(task='toy')))
    cfg.num_pi_trajs = 0
    agent = TDMPC2(cfg)
    params = _perturb(agent.state.params)
    obs, prev_mean, t0, key = _plan_args(agent, cfg)
    a_ref, mean_ref, _ = agent._plan(params, obs, prev_mean, t0, key, None,
                                     eval_mode=True)
    agent._fused_cem = True
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    a_cem, mean_cem, _ = agent._plan(params, obs, prev_mean, t0, key, None,
                                     eval_mode=True)
    np.testing.assert_allclose(np.asarray(mean_cem), np.asarray(mean_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_cem), np.asarray(a_ref),
                               rtol=1e-3, atol=1e-3)


def test_prep_cache_invalidates_on_new_params():
    """act()'s weight-prep cache keys on params-pytree identity: any update/
    load/assignment produces a new pytree and must recompute; same params
    must hit the cache (no per-plan 10 MB cast)."""
    agent, cfg, _ = _make_agent('single')
    agent._fused_cem = True      # enable the prep path on CPU
    p1 = agent._cached_prep(None)
    assert p1 is agent._cached_prep(None)          # cache hit
    agent.state = agent.state.replace(
        params=jax.tree.map(lambda x: x + 0, agent.state.params))
    p2 = agent._cached_prep(None)
    assert p2 is not p1                            # identity-invalidated
    # and the planner accepts the cached prep end-to-end
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    obs, prev_mean, t0, key = _plan_args(agent, cfg)
    a, _, _ = agent._plan(agent.state.params, obs, prev_mean, t0, key, None,
                          eval_mode=True, prep=agent._cached_prep(None))
    assert np.isfinite(np.asarray(a)).all()


def test_cem_kernel_all_tied_values_finite():
    """Zero-init reward/Q heads make every sample's value identical at the
    first plan — the bisection elite weighting degrades to a uniform E/S
    mask and must stay finite (XLA top-k picks an arbitrary subset here, so
    only distributional agreement is expected)."""
    agent, cfg, task = _make_agent('single')
    agent._fused_cem = True
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    obs, prev_mean, t0, key = _plan_args(agent, cfg, seed=3)
    a, mean, _ = agent._plan(agent.state.params, obs, prev_mean,
                             jnp.asarray(True), key, task, eval_mode=False)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.abs(np.asarray(a)) <= 1.0)


def test_act_tasks_with_fused_cem_enabled_matches_kernel_off():
    """act_tasks vmaps _plan over the TASK axis. The prepared kernel weights
    are task-dependent, so with the whole-CEM kernel probed on, the vmap
    batched the weights and ops/pallas_cem.py's _batched guard raised
    (regression: both mt30 offline eval slots crashed at their first eval,
    round-4 session 4). act_tasks now forces fused=False — the XLA planner
    — and must produce bit-identical actions to a kernel-off agent on the
    same state/keys."""
    agent, cfg, _ = _make_agent('multitask')
    agent.state = agent.state.replace(params=_perturb(agent.state.params))
    n = 3
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((n, cfg.obs_shape['state'][0])).astype(np.float32)
    pm = np.zeros((n, cfg.horizon, cfg.action_dim), np.float32)
    tasks = [0, 17, 29]
    st0 = agent.state

    a_off, pm_off = agent.act_tasks(obs, jnp.asarray(pm), True, tasks)

    agent.state = st0                  # same keys for the second pass
    agent._plan_tasks_jit = None       # force a retrace under the new flags
    agent._fused_cem = True
    agent._cem_interpret = True
    agent._pallas_dot_dtype = jnp.float32
    a_on, pm_on = agent.act_tasks(obs, jnp.asarray(pm), True, tasks)

    np.testing.assert_array_equal(a_on, a_off)
    np.testing.assert_array_equal(np.asarray(pm_on), np.asarray(pm_off))
