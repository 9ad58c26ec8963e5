import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.tdmpc2 import TDMPC2

OBS_DIM, ACT_DIM, EP_LEN = 10, 4, 20


def make_cfg(**kw):
    cfg = parse_cfg(Config(task='toy'))
    cfg.obs_shape = {'state': (OBS_DIM,)}
    cfg.action_dim = ACT_DIM
    cfg.episode_length = EP_LEN
    cfg.seed_steps = 100
    # small model/planner for fast CI
    cfg.enc_dim = 64
    cfg.mlp_dim = 64
    cfg.latent_dim = 32
    cfg.num_samples = 64
    cfg.num_elites = 8
    cfg.num_pi_trajs = 8
    cfg.iterations = 2
    cfg.batch_size = 16
    cfg.num_q = 3
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope='module')
def agent():
    return TDMPC2(make_cfg())


def make_batch(key, cfg, batch=None):
    B = batch or cfg.batch_size
    T = cfg.horizon
    ks = jax.random.split(key, 3)
    obs = jax.random.normal(ks[0], (T + 1, B, OBS_DIM))
    action = jnp.clip(jax.random.normal(ks[1], (T, B, ACT_DIM)), -1, 1)
    reward = jax.random.uniform(ks[2], (T, B, 1))
    terminated = jnp.zeros((T, B, 1))
    return obs, action, reward, terminated, None


def test_discount_heuristic(agent):
    # reference tdmpc2.py:57-70: clip((L/5-1)/(L/5), 0.95, 0.995)
    assert agent._get_discount(500) == pytest.approx(0.99)
    assert agent._get_discount(100) == pytest.approx(0.95)
    assert agent._get_discount(10_000) == pytest.approx(0.995)
    assert agent._get_discount(1000) == pytest.approx(0.995)


def test_iterations_heuristic():
    cfg = make_cfg(action_dim=24, iterations=6)
    a = TDMPC2(cfg)
    assert a.iterations == 8  # +2 for action_dim >= 20 (tdmpc2.py:34)


def test_act_plan_bounds_and_state(agent):
    obs = np.random.randn(OBS_DIM).astype(np.float32)
    a0 = agent.act(obs, t0=True)
    assert a0.shape == (ACT_DIM,)
    assert np.all(np.abs(a0) <= 1.0)
    pm1 = np.asarray(agent.state.prev_mean)
    a1 = agent.act(obs, t0=False)
    pm2 = np.asarray(agent.state.prev_mean)
    assert not np.allclose(pm1, pm2)  # warm-start mean updated
    assert np.all(np.isfinite(pm2))


def test_act_eval_vs_train_mode(agent):
    obs = np.random.randn(OBS_DIM).astype(np.float32)
    a_eval = agent.act(obs, t0=True, eval_mode=True)
    assert np.all(np.abs(a_eval) <= 1.0)


def test_act_without_mpc():
    cfg = make_cfg(mpc=False)
    a = TDMPC2(cfg)
    obs = np.random.randn(OBS_DIM).astype(np.float32)
    act = a.act(obs, t0=True, eval_mode=True)
    assert act.shape == (ACT_DIM,)
    assert np.all(np.abs(act) <= 1.0)


def test_update_losses_finite_and_keys(agent):
    batch = make_batch(jax.random.PRNGKey(0), agent.cfg)
    state0 = agent.state
    new_state, info = agent._update_jit(state0, *batch)
    agent.state = new_state
    for k in ('consistency_loss', 'reward_loss', 'value_loss', 'total_loss',
              'grad_norm', 'pi_loss', 'pi_grad_norm', 'pi_entropy', 'pi_scale'):
        assert k in info
        assert np.isfinite(float(info[k])), k


def test_update_decreases_loss_on_fixed_batch():
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    batch = make_batch(jax.random.PRNGKey(42), cfg)
    losses = []
    for _ in range(30):
        state, info = agent._update_jit(agent.state, *batch)
        agent.state = state
        losses.append(float(info['total_loss']))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]


def test_target_network_polyak():
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    q0 = np.asarray(jax.tree.leaves(agent.state.target_Qs)[0]).copy()
    online0 = np.asarray(jax.tree.leaves(agent.state.params['Qs'])[0]).copy()
    np.testing.assert_array_equal(q0, online0)  # target starts as copy
    batch = make_batch(jax.random.PRNGKey(1), cfg)
    state, _ = agent._update_jit(agent.state, *batch)
    q1 = np.asarray(jax.tree.leaves(state.target_Qs)[0])
    online1 = np.asarray(jax.tree.leaves(state.params['Qs'])[0])
    # target moved a little toward online, but is not equal to it
    assert not np.allclose(q1, q0) or np.allclose(online1, q0)
    # Polyak: target1 = target0 + tau*(online1 - target0)
    expected = q0 + cfg.tau * (online1 - q0)
    np.testing.assert_allclose(q1, expected, rtol=1e-5, atol=1e-7)


def test_update_with_buffer_integration():
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    buf = Buffer(cfg)
    rng = np.random.default_rng(0)
    rows = EP_LEN + 1
    for i in range(3):
        buf.add(dict(
            obs=rng.standard_normal((rows, OBS_DIM)).astype(np.float32),
            action=rng.uniform(-1, 1, (rows, ACT_DIM)).astype(np.float32),
            reward=rng.uniform(0, 1, rows).astype(np.float32),
            terminated=np.zeros(rows, np.float32)))
    info = agent.update(buf)
    assert np.isfinite(float(info['total_loss']))


def test_save_load_roundtrip(tmp_path):
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    batch = make_batch(jax.random.PRNGKey(3), cfg)
    agent.state, _ = agent._update_jit(agent.state, *batch)
    fp = tmp_path / 'agent.pkl'
    agent.save(fp)
    agent2 = TDMPC2(make_cfg())
    agent2.load(str(fp))
    for a, b in zip(jax.tree.leaves(agent.state.params),
                    jax.tree.leaves(agent2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(agent2.state.scale) == pytest.approx(float(agent.state.scale))


def test_episodic_termination_path():
    cfg = make_cfg(episodic=True)
    agent = TDMPC2(cfg)
    obs, action, reward, _, _ = make_batch(jax.random.PRNGKey(5), cfg)
    terminated = (jax.random.uniform(jax.random.PRNGKey(6),
                                     (cfg.horizon, cfg.batch_size, 1)) < 0.2
                  ).astype(jnp.float32)
    agent.state, info = agent._update_jit(agent.state, obs, action, reward, terminated)
    assert np.isfinite(float(info['termination_loss']))
    assert 'termination_f1' in info
    # planner works with termination head
    a = agent.act(np.zeros(OBS_DIM, np.float32), t0=True)
    assert np.all(np.isfinite(a))


def test_multitask_update_and_plan():
    cfg = make_cfg(task='mt30')
    cfg = parse_cfg(cfg)
    cfg.obs_shape = {'state': (OBS_DIM,)}
    cfg.action_dim = ACT_DIM
    cfg.action_dims = [ACT_DIM] * 15 + [2] * 15
    cfg.episode_lengths = [EP_LEN] * 30
    cfg.episode_length = EP_LEN
    # re-apply small-model settings clobbered by parse_cfg
    cfg.enc_dim = 64; cfg.mlp_dim = 64; cfg.latent_dim = 32
    cfg.num_samples = 64; cfg.num_elites = 8; cfg.num_pi_trajs = 8
    cfg.iterations = 2; cfg.batch_size = 16; cfg.num_q = 3
    agent = TDMPC2(cfg)
    obs, action, reward, terminated, _ = make_batch(jax.random.PRNGKey(7), cfg)
    task = jax.random.randint(jax.random.PRNGKey(8), (cfg.batch_size,), 0, 30)
    agent.state, info = agent._update_jit(agent.state, obs, action, reward, terminated, task)
    assert np.isfinite(float(info['total_loss']))
    # act with a task whose action space is smaller: masked dims must be 0
    a = agent.act(np.zeros(OBS_DIM, np.float32), t0=True, task=20)
    assert a.shape == (ACT_DIM,)
    np.testing.assert_allclose(a[2:], 0.0, atol=1e-6)


def test_update_many_matches_sequential_updates():
    """update_many(n) must equal n sequential update() calls given the same
    replay draws (fused scan + batched gather, same RNG chain)."""
    import copy
    from tdmpc2_tpu.data.buffer import Buffer

    def build():
        cfg = make_cfg()
        cfg.batch_size = 8
        agent = TDMPC2(cfg)
        buf = Buffer(cfg)
        rng = np.random.default_rng(0)
        rows = cfg.episode_length + 1
        for i in range(3):
            buf.add(dict(
                obs=rng.standard_normal((rows, cfg.obs_shape['state'][0])).astype(np.float32),
                action=rng.uniform(-1, 1, (rows, cfg.action_dim)).astype(np.float32),
                reward=rng.standard_normal(rows).astype(np.float32),
                terminated=np.zeros(rows, np.float32)))
        return agent, buf

    # Numerical equivalence on the SAME pre-drawn batches: the fused
    # scan (_update_scan) must produce the same final state as n sequential
    # _update calls consuming batch i in order (same RNG chain from the
    # shared initial state.key).
    agent1, buf1 = build()
    batch = buf1.sample_many(3)  # leaves [3, T(+1), B, ...]; task None
    st_seq = agent1.state
    for i in range(3):
        st_seq, info_seq = agent1._update_jit(
            st_seq, *[x[i] for x in batch[:-1]])
    agent2, _ = build()
    st_fused, info_many = agent2._update_scan_jit(agent2.state, *batch[:-1])

    assert set(info_many) == set(info_seq)
    for a, b in zip(jax.tree.leaves(st_seq.params),
                    jax.tree.leaves(st_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(info_seq['total_loss']),
                               float(info_many['total_loss']),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_seq.scale),
                               np.asarray(st_fused.scale), rtol=1e-5)
    # the scan consumed exactly one replay draw for all 3 batches
    assert buf1._draws == 1


def test_update_chunk_caps_fused_scan_length():
    """cfg.update_chunk splits update_many(n) into ceil(n/chunk) scan
    dispatches, each with its own sample_many draw — the HBM guard for
    pixel-scale replay batches (a fused update materializes its whole
    batch; 16 pixel batches next to the 12.3 GB device ring OOMed a 16 GB
    v5e, tdmpc2.py update_many docstring)."""
    from tdmpc2_tpu.data.buffer import Buffer

    cfg = make_cfg()
    cfg.batch_size = 8
    cfg.update_chunk = 2
    agent = TDMPC2(cfg)
    buf = Buffer(cfg)
    rng = np.random.default_rng(0)
    rows = cfg.episode_length + 1
    buf.add(dict(
        obs=rng.standard_normal(
            (rows, cfg.obs_shape['state'][0])).astype(np.float32),
        action=rng.uniform(-1, 1, (rows, cfg.action_dim)).astype(np.float32),
        reward=rng.standard_normal(rows).astype(np.float32),
        terminated=np.zeros(rows, np.float32)))
    draws0 = buf._draws
    info = agent.update_many(buf, 5)          # chunks of 2, 2, 1
    assert buf._draws - draws0 == 3
    assert np.isfinite(float(info['total_loss']))


def test_auto_update_chunk_is_bytes_aware(monkeypatch):
    """update_chunk=0 resolves to a bytes-aware cap (VERDICT r4 #8): free
    HBM (v5e fallback budget minus ring and train state when memory_stats
    is unavailable) divided by the sampled-batch footprint. The one
    measured geometry — walker 64px rgb, 12.3 GB ring, ~151 MB batches —
    must resolve to the proven-safe chunk 8 (16 OOMed, commit 0134e2a);
    small state batches must stay effectively uncapped."""
    import tdmpc2_tpu.tdmpc2 as agent_mod

    cfg = make_cfg()
    cfg.batch_size = 8
    agent = TDMPC2(cfg)
    # deterministic: force the tunneled-backend fallback path
    monkeypatch.setattr(agent_mod, '_device_free_bytes', lambda: None)

    class FakeBuffer:
        def __init__(self, ring, bb):
            self._ring, self._bb = ring, bb
            self._storage = object()  # sentinel: storage initialized
        def device_ring_bytes(self):
            return self._ring
        def sample_batch_bytes(self):
            return self._bb

    # walker-rgb geometry: (horizon+1)=4 x 256 x 9*64*64 x 4B obs-dominated
    rgb_bb = 4 * 256 * 9 * 64 * 64 * 4 + 3 * 256 * (6 + 2) * 4
    assert agent._auto_update_chunk(FakeBuffer(12_300_000_000, rgb_bb)) == 8
    # state geometry: tiny batches, big cap (no practical chunking)
    state_cap = agent._auto_update_chunk(FakeBuffer(120_000_000, 100_000))
    assert state_cap > 1000
    # more free HBM (smaller ring) must never shrink the cap
    assert agent._auto_update_chunk(FakeBuffer(6_000_000_000, rgb_bb)) >= 8
    # the cap is a floor of 1 even when the model says nothing fits
    assert agent._auto_update_chunk(FakeBuffer(15_800_000_000, rgb_bb)) == 1

    # end-to-end: cfg.update_chunk=0 + a real (small) buffer -> auto cap is
    # cached and large enough that update_many(3) stays one fused dispatch
    from tdmpc2_tpu.data.buffer import Buffer
    buf = Buffer(cfg)
    rng = np.random.default_rng(0)
    rows = cfg.episode_length + 1
    buf.add(dict(
        obs=rng.standard_normal(
            (rows, cfg.obs_shape['state'][0])).astype(np.float32),
        action=rng.uniform(-1, 1, (rows, cfg.action_dim)).astype(np.float32),
        reward=rng.standard_normal(rows).astype(np.float32),
        terminated=np.zeros(rows, np.float32)))
    bb = buf.sample_batch_bytes()
    T, B = cfg.horizon, cfg.batch_size
    expected_obs = (T + 1) * B * cfg.obs_shape['state'][0] * 4
    assert bb >= expected_obs and bb < expected_obs + T * B * 64 * 4
    draws0 = buf._draws
    agent.update_many(buf, 3)
    assert buf._draws - draws0 == 1
