"""Fused Pallas MPPI rollout vs the XLA scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu.models import layers
from tdmpc2_tpu.ops import math
from tdmpc2_tpu.ops.pallas_rollout import fused_value_rollout, rollout_supported


def _xla_reference(dyn, rew, z0, actions, horizon, discount, simnorm_dim,
                   num_bins, vmin, vmax):
    z, G, disc = z0, jnp.zeros((z0.shape[0], 1)), 1.0
    for t in range(horizon):
        a = actions[t]
        za = jnp.concatenate([z, a], axis=-1)
        r = math.two_hot_inv(layers.mlp_apply(rew, za), num_bins, vmin, vmax)
        z = layers.mlp_apply(
            dyn, za, final_act=lambda x: layers.simnorm(x, simnorm_dim))
        G = G + disc * r
        disc = disc * discount
    return G, z


@pytest.mark.parametrize('S,L,A,B', [(32, 32, 4, 5), (16, 64, 8, 101)])
def test_fused_rollout_matches_xla(S, L, A, B):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D = 32
    dyn = layers.mlp_init(k1, L + A, [D, D], L, final_normed=True)
    rew = layers.mlp_init(k2, L + A, [D, D], B)
    # non-zero reward head so the two-hot decode is exercised
    rew = rew[:-1] + ({'w': 0.1 * jax.random.normal(k3, (D, B)),
                       'b': jnp.zeros(B)},)
    z0 = layers.simnorm(jax.random.normal(k4, (S, L)), 8)
    actions = jax.random.uniform(jax.random.PRNGKey(5), (3, S, A),
                                 minval=-1, maxval=1)

    G_ref, z_ref = _xla_reference(dyn, rew, z0, actions, 3, 0.97, 8, B,
                                  -10.0, 10.0)
    # f32 dots: exact logic check
    G, zH = fused_value_rollout(dyn, rew, z0, actions, horizon=3,
                                discount=0.97, simnorm_dim=8, vmin=-10.0,
                                vmax=10.0, interpret=True,
                                dot_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zH), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-5)
    # bf16 dots (the TPU fast path): loose tolerance
    Gb, zb = fused_value_rollout(dyn, rew, z0, actions, horizon=3,
                                 discount=0.97, simnorm_dim=8, vmin=-10.0,
                                 vmax=10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(Gb), np.asarray(G_ref),
                               rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(z_ref),
                               rtol=0.5, atol=0.03)


def test_rollout_supported_gate():
    class C:
        multitask = False
        episodic = False
        num_bins = 101
        latent_dim = 512
        simnorm_dim = 8
    assert rollout_supported(C)
    C.multitask = True        # supported since the bias-folding rework
    assert rollout_supported(C)
    C.episodic = True         # supported: termination head runs in-kernel
    assert rollout_supported(C)
    C.num_bins = 1            # scalar critic not covered by two-hot decode
    assert not rollout_supported(C)
    C.num_bins = 101
    C.latent_dim = 513        # SimNorm grouping must tile the latent
    assert not rollout_supported(C)


def _small(cfg):
    cfg.obs_shape = {'state': (10,)}
    cfg.action_dim = 4
    cfg.episode_length = 20
    cfg.enc_dim, cfg.mlp_dim, cfg.latent_dim = 64, 64, 32
    cfg.num_samples, cfg.num_elites, cfg.num_pi_trajs = 64, 8, 8
    cfg.iterations, cfg.num_q = 2, 3
    return cfg


@pytest.mark.parametrize('mode', ['single', 'episodic', 'multitask'])
def test_fused_value_kernel_matches_agent_estimate(mode):
    """The fully fused CEM value kernel (rollout + terminal pi + 2-of-N Q
    decode + episodic termination gate, ops/pallas_rollout._value_kernel)
    must reproduce the agent's XLA `_estimate_value` exactly (same params,
    same RNG chain, f32 dots) — including multitask, where the task
    embedding and action mask are folded into the prepared weights."""
    from tdmpc2_tpu.config import Config, parse_cfg
    from tdmpc2_tpu.ops.pallas_rollout import value_prepared
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    if mode == 'multitask':
        cfg = _small(parse_cfg(Config(task='mt30')))
        cfg.action_dims = [4] * 15 + [2] * 15
        cfg.episode_lengths = [20] * 30
        task = jnp.asarray([20])      # a task with masked action dims
    else:
        cfg = _small(parse_cfg(Config(task='toy')))
        cfg.episodic = (mode == 'episodic')
        task = None
    agent = TDMPC2(cfg)               # CPU -> _fused_rollout False: XLA path
    assert not agent._fused_rollout
    params = agent.state.params

    key = jax.random.PRNGKey(3)
    kz, ka, kv = jax.random.split(key, 3)
    S, L, A, H = 32, cfg.latent_dim, cfg.action_dim, cfg.horizon
    z0 = layers.simnorm(jax.random.normal(kz, (S, L)), cfg.simnorm_dim)
    actions = jax.random.uniform(ka, (H, S, A), minval=-1, maxval=1)
    if mode == 'multitask':           # planner pre-masks sampled actions
        actions = actions * agent.model.action_masks[task]

    ref = agent._estimate_value(params, z0, actions, kv, task)

    # identical key-split sequence to the agent's fused branch
    k_pi, k_q = jax.random.split(kv)
    eps = jax.random.normal(k_pi, (S, A), jnp.float32)
    if mode == 'multitask':
        eps = eps * agent.model.action_masks[task]
    qidx = jax.random.permutation(k_q, cfg.num_q)[:2]
    discount_f = jnp.asarray(agent._task_discount(task), jnp.float32)
    discs = discount_f ** jnp.arange(H + 1)

    def run(prep, block_s):
        return value_prepared(
            prep, z0, actions, eps, qidx, discs, horizon=H,
            episodic=cfg.episodic,
            log_std_min=agent.model.log_std_min,
            log_std_dif=agent.model.log_std_dif,
            dot_dtype=jnp.float32, interpret=True, block_s=block_s)

    # f32 prep for exact comparison (production prep uses bf16 dots)
    from tdmpc2_tpu.ops.pallas_rollout import prepare_value_params
    if mode == 'multitask':
        prep = prepare_value_params(
            params, cfg, task=task,
            action_mask=agent.model.action_masks[task][0],
            dot_dtype=jnp.float32)
    else:
        prep = prepare_value_params(params, cfg, dot_dtype=jnp.float32)

    got = run(prep, block_s=S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # grid-blocked variant (multiple programs over samples) is identical
    got_blk = run(prep, block_s=16)
    np.testing.assert_allclose(np.asarray(got_blk), np.asarray(got),
                               rtol=1e-6, atol=1e-6)

    if mode == 'episodic':
        # the termination gate must actually fire for some sample (otherwise
        # this parity run never exercised the gate)
        term_p = agent.model.termination(params, z0, task)
        assert bool(jnp.any(term_p > 0.5)) or np.allclose(
            np.asarray(got), np.asarray(ref))


def test_fused_value_kernel_vmap_matches_sequential():
    """Batched acting vmaps the planner over the env axis; the kernel's
    custom_vmap rule folds envs into the sample axis (one flat pallas_call,
    per-env [N,2]/[N,H+1] SMEM scalar operands). Round 2 regression: letting
    vmap tile the call instead fails to lower on real TPUs for num_envs>1
    (non-lane-aligned SMEM blocks). The rule must equal per-env calls."""
    from tdmpc2_tpu.config import Config, parse_cfg
    from tdmpc2_tpu.ops.pallas_rollout import (prepare_value_params,
                                               value_prepared)
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _small(parse_cfg(Config(task='toy')))
    agent = TDMPC2(cfg)
    params = agent.state.params
    prep = prepare_value_params(params, cfg, dot_dtype=jnp.float32)

    N, S, L, A, H = 3, 32, cfg.latent_dim, cfg.action_dim, cfg.horizon
    key = jax.random.PRNGKey(9)
    kz, ka, ke, kq = jax.random.split(key, 4)
    z0 = layers.simnorm(jax.random.normal(kz, (N, S, L)), cfg.simnorm_dim)
    actions = jax.random.uniform(ka, (N, H, S, A), minval=-1, maxval=1)
    eps = jax.random.normal(ke, (N, S, A))
    qidx = jnp.stack([jax.random.permutation(k, cfg.num_q)[:2]
                      for k in jax.random.split(kq, N)])
    discs = jnp.asarray(0.97) ** jnp.arange(H + 1)

    def one(z, a, e, qi):
        # block_s=16 -> blocks_per_env=2: exercises the per-env grid indexing
        return value_prepared(prep, z, a, e, qi, discs, horizon=H,
                              episodic=False,
                              log_std_min=agent.model.log_std_min,
                              log_std_dif=agent.model.log_std_dif,
                              dot_dtype=jnp.float32, interpret=True,
                              block_s=16)

    seq = jnp.stack([one(z0[i], actions[i], eps[i], qidx[i])
                     for i in range(N)])
    bat = jax.vmap(one)(z0, actions, eps, qidx)
    np.testing.assert_allclose(np.asarray(bat), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)

    # unbatched operands broadcast inside the rule (discs is shared; eps/qidx
    # batched) — mirror of the in_axes mix `_plan_vec` actually produces
    bat2 = jax.vmap(
        lambda z, a, e, qi, d: value_prepared(
            prep, z, a, e, qi, d, horizon=H, episodic=False,
            log_std_min=agent.model.log_std_min,
            log_std_dif=agent.model.log_std_dif,
            dot_dtype=jnp.float32, interpret=True, block_s=16),
        in_axes=(0, 0, 0, 0, None))(z0, actions, eps, qidx, discs)
    np.testing.assert_allclose(np.asarray(bat2), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)


def test_probe_value_kernel_never_raises():
    """The construction-time hardware probe must return a bool and swallow
    every failure mode (it gates the planner fallback; an exception here
    would kill agent construction)."""
    from tdmpc2_tpu.config import Config, parse_cfg
    from tdmpc2_tpu.ops.pallas_rollout import probe_value_kernel
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = parse_cfg(Config(task='toy'))
    cfg.obs_shape = {'state': (10,)}
    cfg.action_dim = 4
    cfg.episode_length = 20
    cfg.enc_dim, cfg.mlp_dim, cfg.latent_dim = 64, 64, 32
    agent = TDMPC2(cfg)
    ok = probe_value_kernel(agent.state.params, cfg,
                            agent.model.log_std_min, agent.model.log_std_dif)
    assert isinstance(ok, bool)


def test_fused_rollout_grid_blocked():
    """Grid-blocked path (multiple programs over the sample axis) matches
    the single-program result."""
    from tdmpc2_tpu.ops.pallas_rollout import (prepare_rollout_params,
                                               rollout_prepared)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    S, L, A, D, B = 64, 32, 4, 32, 5
    dyn = layers.mlp_init(k1, L + A, [D, D], L, final_normed=True)
    rew = layers.mlp_init(k2, L + A, [D, D], B)
    z0 = layers.simnorm(jax.random.normal(k3, (S, L)), 8)
    actions = jax.random.uniform(jax.random.PRNGKey(7), (3, S, A),
                                 minval=-1, maxval=1)
    prep = prepare_rollout_params(dyn, rew, L, 8, -10., 10.,
                                  dot_dtype=jnp.float32)
    G1, z1 = rollout_prepared(prep, z0, actions, horizon=3, discount=0.9,
                              dot_dtype=jnp.float32, interpret=True,
                              block_s=S)       # single program
    G2, z2 = rollout_prepared(prep, z0, actions, horizon=3, discount=0.9,
                              dot_dtype=jnp.float32, interpret=True,
                              block_s=16)      # 4 grid programs
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5)


def test_mosaic_canary_timeout_disables_pallas(monkeypatch):
    """A WEDGED Mosaic engine hangs instead of raising (observed live:
    kill mid-Pallas-program -> every later kernel execution blocks while
    XLA works). The subprocess canary must convert that hang into a clean
    False so agent init / bench fall back to the XLA planner."""
    import subprocess
    import jax
    from tdmpc2_tpu.ops import pallas_rollout as pr

    monkeypatch.setattr(pr, '_MOSAIC_CANARY', None)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd='canary', timeout=kw.get('timeout'))
    monkeypatch.setattr(subprocess, 'run', fake_run)
    assert pr.mosaic_engine_alive(timeout=0.01) is False
    # verdict is cached: a second call must not re-spawn (fake_run raising
    # a different error would flip the result if it ran again)
    monkeypatch.setattr(subprocess, 'run',
                        lambda *a, **kw: (_ for _ in ()).throw(AssertionError))
    assert pr.mosaic_engine_alive() is False


def test_mosaic_canary_short_circuits_off_tpu(monkeypatch):
    from tdmpc2_tpu.ops import pallas_rollout as pr
    monkeypatch.setattr(pr, '_MOSAIC_CANARY', None)
    assert pr.mosaic_engine_alive() is True  # CPU backend: nothing to wedge
