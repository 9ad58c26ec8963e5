"""Fused actor-learner step (TDMPC2.vec_step / FleetAgent.step).

The one-dispatch plan+sample+update composition must be numerically
identical to the separate act() -> update_many() sequence it replaces
(same key threading, same replay draw stream, actions planned with the
pre-update parameters), and the vec trainer must produce the same run
under fused_step=true and fused_step=false.
"""

import numpy as np
import pytest

import jax

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.data.fleet_buffer import FleetBuffer
from tdmpc2_tpu.fleet import FleetAgent
from tdmpc2_tpu.tdmpc2 import TDMPC2

OBS_DIM, ACT_DIM, EP_LEN = 6, 2, 20

pytestmark = pytest.mark.slow  # fused-step equivalence sweeps

SEEDS = [3, 7]


def make_cfg(**kw):
    cfg = parse_cfg(Config(task='toy'))
    cfg.obs_shape = {'state': (OBS_DIM,)}
    cfg.action_dim = ACT_DIM
    cfg.episode_length = EP_LEN
    cfg.seed_steps = 40
    cfg.enc_dim = 32
    cfg.mlp_dim = 32
    cfg.latent_dim = 16
    cfg.num_samples = 32
    cfg.num_elites = 4
    cfg.num_pi_trajs = 4
    cfg.iterations = 1
    cfg.batch_size = 8
    cfg.num_q = 2
    cfg.num_envs = 2
    cfg.use_pallas = False
    cfg.buffer_device = 'device'
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def make_episode(rng, rows):
    obs = rng.standard_normal((rows, OBS_DIM)).astype(np.float32)
    action = rng.uniform(-1, 1, (rows, ACT_DIM)).astype(np.float32)
    reward = rng.uniform(0, 1, rows).astype(np.float32)
    action[0] = np.nan
    reward[0] = np.nan
    return dict(obs=obs, action=action, reward=reward,
                terminated=np.zeros(rows, np.float32))


def fill(buf, n_eps=3, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_eps):
        buf.add(make_episode(rng, EP_LEN + 1))


def tree_allclose(a, b, rtol=2e-5, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_vec_step_matches_act_then_update_many():
    cfg = make_cfg()
    seq, fused = TDMPC2(cfg), TDMPC2(cfg)
    buf_seq, buf_fused = Buffer(cfg), Buffer(cfg)
    fill(buf_seq)
    fill(buf_fused)
    assert buf_fused._on_device, 'test requires device-resident storage'

    rng = np.random.default_rng(1)
    obs = rng.standard_normal((cfg.num_envs, OBS_DIM)).astype(np.float32)
    t0 = np.array([True, False])
    for step in range(3):
        a_seq = seq.act(obs, t0=t0)
        info_seq = seq.update_many(buf_seq, cfg.num_envs)
        a_fused, info_fused = fused.vec_step(buf_fused, obs, t0, cfg.num_envs)
        np.testing.assert_allclose(a_seq, a_fused, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(info_seq['total_loss']), float(info_fused['total_loss']),
            rtol=2e-5, atol=1e-6)
        t0 = np.array([False, False])
        obs = rng.standard_normal((cfg.num_envs, OBS_DIM)).astype(np.float32)
    tree_allclose(seq.state.params, fused.state.params)
    tree_allclose(seq.state.prev_mean, fused.state.prev_mean)
    np.testing.assert_array_equal(
        np.asarray(seq.state.key), np.asarray(fused.state.key))
    assert buf_seq._draws == buf_fused._draws


def test_vec_step_single_update_per_step():
    """n_updates == 1 exercises the unbatched sample layout inside the jit."""
    cfg = make_cfg(num_envs=1)
    seq, fused = TDMPC2(cfg), TDMPC2(cfg)
    buf_seq, buf_fused = Buffer(cfg), Buffer(cfg)
    fill(buf_seq)
    fill(buf_fused)
    obs = np.random.default_rng(2).standard_normal(
        (1, OBS_DIM)).astype(np.float32)
    a_seq = seq.act(obs, t0=True)
    seq.update_many(buf_seq, 1)
    a_fused, _ = fused.vec_step(buf_fused, obs, np.array([True]), 1)
    np.testing.assert_allclose(a_seq, a_fused, rtol=2e-5, atol=1e-5)
    tree_allclose(seq.state.params, fused.state.params)


def test_update_many_fused_matches_update_many():
    """In-jit replay draw (one dispatch) == sample_many + update scan."""
    cfg = make_cfg()
    seq, fused = TDMPC2(cfg), TDMPC2(cfg)
    buf_seq, buf_fused = Buffer(cfg), Buffer(cfg)
    fill(buf_seq)
    fill(buf_fused)
    for _ in range(2):
        info_seq = seq.update_many(buf_seq, 3)
        info_fused = fused.update_many_fused(buf_fused, 3)
        np.testing.assert_allclose(
            float(info_seq['total_loss']), float(info_fused['total_loss']),
            rtol=2e-5, atol=1e-6)
    tree_allclose(seq.state.params, fused.state.params)
    assert buf_seq._draws == buf_fused._draws

    # fleet analogue
    fseq, ffused = FleetAgent(cfg, SEEDS), FleetAgent(cfg, SEEDS)
    fb_seq, fb_fused = FleetBuffer(cfg, len(SEEDS)), \
        FleetBuffer(cfg, len(SEEDS))
    rng = np.random.default_rng(5)
    for k in range(len(SEEDS)):
        ep = make_episode(rng, EP_LEN + 1)
        block = {key: v[None] for key, v in ep.items()}
        block['valid_rows'] = np.asarray([EP_LEN + 1], np.int32)
        fb_seq.add(k, {key: v.copy() for key, v in block.items()})
        fb_fused.add(k, block)
    i_seq = fseq.update_many(fb_seq, 2)
    i_fused = ffused.update_many_fused(fb_fused, 2)
    np.testing.assert_allclose(
        float(i_seq['total_loss']), float(i_fused['total_loss']),
        rtol=2e-5, atol=1e-6)
    tree_allclose(fseq.state.params, ffused.state.params)


def test_vec_step_host_buffer_fallback():
    cfg = make_cfg(buffer_device='host')
    agent = TDMPC2(cfg)
    buf = Buffer(cfg)
    fill(buf)
    assert not buf._on_device
    obs = np.zeros((cfg.num_envs, OBS_DIM), np.float32)
    a, info = agent.vec_step(buf, obs, np.array([True, True]), cfg.num_envs)
    assert a.shape == (cfg.num_envs, ACT_DIM)
    assert np.isfinite(float(info['total_loss']))
    assert agent._megastep_jit is None  # fell back, never traced


def test_fleet_step_matches_act_then_update_many():
    cfg = make_cfg()
    seq, fused = FleetAgent(cfg, SEEDS), FleetAgent(cfg, SEEDS)
    buf_seq, buf_fused = FleetBuffer(cfg, len(SEEDS)), \
        FleetBuffer(cfg, len(SEEDS))
    rng = np.random.default_rng(3)
    for k in range(len(SEEDS)):
        for _ in range(3):
            ep = make_episode(rng, EP_LEN + 1)
            block = {key: v[None] for key, v in ep.items()}
            block['valid_rows'] = np.asarray([EP_LEN + 1], np.int32)
            buf_seq.add(k, {key: v.copy() for key, v in block.items()})
            buf_fused.add(k, block)

    K, N = len(SEEDS), cfg.num_envs
    obs = rng.standard_normal((K, N, OBS_DIM)).astype(np.float32)
    t0 = np.ones((K, N), bool)
    for step in range(2):
        a_seq = seq.act(obs, t0=t0)
        info_seq = seq.update_many(buf_seq, N)
        a_fused, info_fused = fused.step(buf_fused, obs, t0, N)
        np.testing.assert_allclose(a_seq, a_fused, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(info_seq['total_loss']), float(info_fused['total_loss']),
            rtol=2e-5, atol=1e-6)
        t0 = np.zeros((K, N), bool)
        obs = rng.standard_normal((K, N, OBS_DIM)).astype(np.float32)
    tree_allclose(seq.state.params, fused.state.params)
    np.testing.assert_array_equal(
        np.asarray(seq.state.key), np.asarray(fused.state.key))


def test_vec_trainer_fused_equals_unfused(tmp_path):
    """Full vec training run on the toy env: fused_step=true must reproduce
    the fused_step=false run exactly (same envs, same seeds, deterministic
    toy dynamics -> identical trajectories and final parameters)."""
    from tdmpc2_tpu.envs import make_env
    from tdmpc2_tpu.trainer import VecOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    def run(fused, sub, overlap=True):
        cfg = parse_cfg(Config(task='toy-reach'))
        cfg.steps = 200
        cfg.eval_freq = 500  # no mid-run eval
        cfg.eval_episodes = 1
        cfg.batch_size = 8
        cfg.enc_dim = 32
        cfg.mlp_dim = 32
        cfg.latent_dim = 16
        cfg.num_q = 2
        cfg.num_samples = 32
        cfg.num_elites = 4
        cfg.num_pi_trajs = 4
        cfg.iterations = 1
        cfg.num_envs = 2
        cfg.use_pallas = False
        cfg.buffer_device = 'device'
        cfg.save_video = False
        cfg.save_agent = False
        cfg.fused_step = fused
        cfg.overlap_update = overlap
        cfg.work_dir = str(tmp_path / sub)
        env = make_env(cfg)
        cfg.seed_steps = 60
        agent = TDMPC2(cfg)
        trainer = VecOnlineTrainer(cfg=cfg, env=env, agent=agent,
                                   buffer=Buffer(cfg), logger=Logger(cfg))
        trainer.train()
        return agent

    a_pipe = run(True, 'pipe', overlap=True)
    a_mega = run(True, 'mega', overlap=False)
    a_plain = run(False, 'plain')
    assert a_mega._megastep_jit is not None   # megastep path was exercised
    assert a_pipe._upd_fused_jit is not None  # pipelined path was exercised
    tree_allclose(a_mega.state.params, a_plain.state.params,
                  rtol=5e-5, atol=1e-5)
    tree_allclose(a_pipe.state.params, a_plain.state.params,
                  rtol=5e-5, atol=1e-5)


def test_fleet_step_mesh_sharded_matches_unsharded():
    """Fleet over a device mesh: the seed axis sharded across 2 CPU devices
    must reproduce the single-device fleet exactly — seeds are
    embarrassingly parallel (params, optimizer state, replay ring and env
    batch all live on the seed's owner device; no collectives in the hot
    loop beyond the scalar metrics mean)."""
    from tdmpc2_tpu import parallel

    cfg = make_cfg()
    mesh = parallel.make_mesh('2x1', devices=jax.devices()[:2])
    plain = FleetAgent(cfg, SEEDS)
    shard = FleetAgent(cfg, SEEDS, mesh=mesh)
    buf_plain = FleetBuffer(cfg, len(SEEDS))
    buf_shard = FleetBuffer(cfg, len(SEEDS), mesh=mesh)
    rng = np.random.default_rng(4)
    for k in range(len(SEEDS)):
        for _ in range(3):
            ep = make_episode(rng, EP_LEN + 1)
            block = {key: v[None] for key, v in ep.items()}
            block['valid_rows'] = np.asarray([EP_LEN + 1], np.int32)
            buf_plain.add(k, {key: v.copy() for key, v in block.items()})
            buf_shard.add(k, block)

    K, N = len(SEEDS), cfg.num_envs
    obs = rng.standard_normal((K, N, OBS_DIM)).astype(np.float32)
    t0 = np.ones((K, N), bool)
    for _ in range(2):
        a_plain, info_plain = plain.step(buf_plain, obs, t0, N)
        a_shard, info_shard = shard.step(buf_shard, obs, t0, N)
        np.testing.assert_allclose(a_plain, a_shard, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(info_plain['total_loss']), float(info_shard['total_loss']),
            rtol=2e-5, atol=1e-6)
        t0 = np.zeros((K, N), bool)
        obs = rng.standard_normal((K, N, OBS_DIM)).astype(np.float32)
    tree_allclose(plain.state.params, shard.state.params)
    # state leaves actually carry the seed sharding
    leaf = jax.tree.leaves(shard.state.params)[0]
    assert len(leaf.sharding.device_set) == 2


def test_vec_trainer_fused_episodic(tmp_path):
    """Episodic vec training through the fused megastep: early terminations
    produce variable-length episodes + termination-head training while every
    steady-state step goes through vec_step (reference episodic semantics:
    envs/mujoco.py:24-31, online_trainer.py:90-101)."""
    from tdmpc2_tpu.data.buffer import Buffer as _Buffer
    from tdmpc2_tpu.envs import make_env
    from tdmpc2_tpu.tdmpc2 import TDMPC2 as _Agent
    from tdmpc2_tpu.trainer import VecOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    cfg = parse_cfg(Config(
        task='toy-reach-episodic', episodic=True, batch_size=8,
        latent_dim=16, mlp_dim=32, enc_dim=32, num_q=2, num_bins=5,
        num_samples=16, num_elites=4, num_pi_trajs=2, iterations=1,
        horizon=3, steps=300, eval_freq=1000, eval_episodes=1,
        num_envs=2, use_pallas=False, buffer_device='device',
        save_agent=False, save_csv=False))
    cfg.work_dir = str(tmp_path)
    env = make_env(cfg)
    cfg.seed_steps = 150
    agent = _Agent(cfg)
    buffer = _Buffer(cfg)
    VecOnlineTrainer(cfg=cfg, env=env, agent=agent, buffer=buffer,
                     logger=Logger(cfg)).train()
    assert (agent._upd_fused_jit is not None
            or agent._megastep_jit is not None)  # a fused path was exercised
    assert buffer.num_eps >= 3
    term = np.asarray(buffer.sample()[3])
    assert np.isfinite(term).all() and term.min() >= 0.0


def test_fleet_trainer_fused_e2e(tmp_path):
    """Full fleet training loop through the fused megastep branch: 3 seeds
    cross the seed phase + pretrain burst and train via FleetAgent.step."""
    from tdmpc2_tpu.data.fleet_buffer import FleetBuffer
    from tdmpc2_tpu.envs import make_fleet_env
    from tdmpc2_tpu.trainer.fleet_online import FleetOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    cfg = parse_cfg(Config(
        task='toy-reach', batch_size=8, latent_dim=16, mlp_dim=32,
        enc_dim=32, num_q=2, num_bins=5, num_samples=16, num_elites=4,
        num_pi_trajs=2, iterations=1, horizon=3, steps=300, eval_freq=1000,
        eval_episodes=1, num_envs=2, save_agent=False, save_csv=False,
        use_pallas=False))
    cfg.work_dir = str(tmp_path / 'toy-reach' / '1' / 'x')
    seeds = [1, 2, 3]
    env = make_fleet_env(cfg, seeds)
    cfg.seed_steps = 120
    agent = FleetAgent(cfg, seeds)
    loggers = [Logger(cfg.replace(seed=s, work_dir=str(agent.work_dir(k))))
               for k, s in enumerate(seeds)]
    FleetOnlineTrainer(cfg=cfg, env=env, agent=agent,
                       buffer=FleetBuffer(cfg, 3), loggers=loggers).train()
    assert (agent._upd_fused_jit is not None
            or agent._step_jit is not None)  # a fused path was exercised
