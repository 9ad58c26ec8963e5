"""Fleet training (K seeds in one process, tdmpc2_tpu/fleet.py): the
seed-stacked agent must reproduce K independent single-seed agents exactly,
and the end-to-end fleet loop must produce per-seed artifacts identical in
layout to single-seed runs."""

import numpy as np
import pytest

import jax

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.fleet_buffer import FleetBuffer
from tdmpc2_tpu.fleet import FleetAgent
from tdmpc2_tpu.tdmpc2 import TDMPC2

OBS_DIM, ACT_DIM, EP_LEN = 6, 2, 20


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
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


SEEDS = [3, 7]


def singles(cfg):
    return [TDMPC2(cfg.replace(seed=s, use_pallas=False)) for s in SEEDS]


def tree_allclose(a, b, rtol=2e-5, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_fleet_init_matches_single_agents():
    cfg = make_cfg()
    fleet = FleetAgent(cfg, SEEDS)
    for k, single in enumerate(singles(cfg)):
        tree_allclose(fleet.seed_state(k).params, single.state.params,
                      rtol=0, atol=0)
        np.testing.assert_array_equal(
            np.asarray(fleet.seed_state(k).key), np.asarray(single.state.key))


def test_fleet_act_matches_single_agents():
    cfg = make_cfg()
    fleet = FleetAgent(cfg, SEEDS)
    sgl = singles(cfg)
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((2, cfg.num_envs, OBS_DIM)).astype(np.float32)
    for t0 in (True, False):
        a_fleet = fleet.act(obs, t0=t0)
        for k, single in enumerate(sgl):
            a_single = single.act(obs[k], t0=t0)
            np.testing.assert_allclose(a_fleet[k], a_single,
                                       rtol=2e-5, atol=1e-5)
    # warm-start means advanced identically
    for k, single in enumerate(sgl):
        tree_allclose(fleet.seed_state(k).prev_mean, single.state.prev_mean)


def test_fleet_update_matches_single_agents():
    cfg = make_cfg()
    fleet = FleetAgent(cfg, SEEDS)
    sgl = singles(cfg)
    T, B, n = cfg.horizon, cfg.batch_size, 2
    rng = np.random.default_rng(1)
    batch = (
        rng.standard_normal((2, n, T + 1, B, OBS_DIM)).astype(np.float32),
        rng.uniform(-1, 1, (2, n, T, B, ACT_DIM)).astype(np.float32),
        rng.standard_normal((2, n, T, B, 1)).astype(np.float32),
        np.zeros((2, n, T, B, 1), np.float32),
    )
    fleet.state, infos = fleet._update_scan_jit(fleet.state, *batch)
    single_losses = []
    for k, single in enumerate(sgl):
        st, info = single._update_scan_jit(
            single.state, *[x[k] for x in batch])
        tree_allclose(fleet.seed_state(k).params, st.params)
        single_losses.append(float(info['total_loss']))
        np.testing.assert_allclose(np.asarray(fleet.seed_state(k).scale),
                                   np.asarray(st.scale), rtol=2e-5)
    # metrics are seed-meaned inside the jitted program
    np.testing.assert_allclose(float(infos['total_loss']),
                               float(np.mean(single_losses)), rtol=2e-5)


def test_fleet_buffer_per_seed_isolation():
    cfg = make_cfg()
    buf = FleetBuffer(cfg, 2)
    rows = EP_LEN + 1
    for k, const in ((0, 1.0), (1, -1.0)):
        eps = dict(
            obs=np.full((3, rows, OBS_DIM), const, np.float32),
            action=np.zeros((3, rows, ACT_DIM), np.float32),
            reward=np.full((3, rows), const, np.float32),
            terminated=np.zeros((3, rows), np.float32))
        assert buf.add(k, eps) == 3
    assert buf.num_eps == 3
    obs, action, reward, term, task = buf.sample_many(2)
    T, B = cfg.horizon, cfg.batch_size
    assert obs.shape == (2, 2, T + 1, B, OBS_DIM)
    assert action.shape == (2, 2, T, B, ACT_DIM)
    assert reward.shape == term.shape == (2, 2, T, B, 1)
    assert task is None
    np.testing.assert_array_equal(np.asarray(obs[0]), 1.0)
    np.testing.assert_array_equal(np.asarray(obs[1]), -1.0)
    np.testing.assert_array_equal(np.asarray(reward[0]), 1.0)
    np.testing.assert_array_equal(np.asarray(reward[1]), -1.0)


def test_fleet_buffer_strict_length_and_wraparound():
    cfg = make_cfg()
    cfg.buffer_size = 4 * EP_LEN   # ring of 4 episodes
    cfg.steps = 10 ** 6
    buf = FleetBuffer(cfg, 1)
    rows = EP_LEN + 1
    eps = dict(
        obs=np.zeros((6, rows, OBS_DIM), np.float32),
        action=np.zeros((6, rows, ACT_DIM), np.float32),
        reward=np.arange(6, dtype=np.float32)[:, None].repeat(rows, 1),
        terminated=np.zeros((6, rows), np.float32),
        valid_rows=np.asarray([rows, 2, rows, rows, rows, rows], np.int32))
    # episode 1 is too short for one slice -> dropped (strict_length)
    assert buf.add(0, eps) == 5
    # ring holds the last 4 kept episodes (0 wrapped out): rewards 2..5
    _, _, reward, _, _ = buf.sample_many(1)
    seen = set(np.unique(np.asarray(reward)).tolist())
    assert seen <= {2.0, 3.0, 4.0, 5.0}


@pytest.mark.slow
def test_fleet_train_loop_end_to_end(tmp_path, monkeypatch):
    """Two-seed toy fleet run exercising collection, the pretrain burst,
    fused updates, eval, and checkpointing: per-seed eval.csv + checkpoints
    land in the exact single-seed layout."""
    monkeypatch.chdir(tmp_path)
    from tdmpc2_tpu.envs import make_fleet_env
    from tdmpc2_tpu.trainer.fleet_online import FleetOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    cfg = parse_cfg(Config(task='toy-reach'))
    cfg.steps = 220
    cfg.eval_freq = 200
    cfg.eval_episodes = 1
    cfg.batch_size = 8
    cfg.enc_dim = 32
    cfg.mlp_dim = 32
    cfg.latent_dim = 16
    cfg.num_q = 2
    cfg.num_samples = 16
    cfg.num_elites = 4
    cfg.num_pi_trajs = 2
    cfg.iterations = 1
    cfg.num_envs = 2
    cfg.save_video = False
    env = make_fleet_env(cfg, SEEDS)
    assert env.num_envs == len(SEEDS) * cfg.num_envs
    cfg.seed_steps = 60  # shrink the seed phase for CI
    agent = FleetAgent(cfg, SEEDS)
    buffer = FleetBuffer(cfg, len(SEEDS))
    loggers = [Logger(cfg.replace(seed=s, work_dir=str(agent.work_dir(k))))
               for k, s in enumerate(SEEDS)]
    trainer = FleetOnlineTrainer(cfg=cfg, env=env, agent=agent,
                                 buffer=buffer, loggers=loggers)
    trainer.train()
    assert trainer._step >= cfg.steps
    assert buffer.num_eps >= 2          # every seed collected episodes
    for s in SEEDS:
        d = tmp_path / 'logs' / 'toy-reach' / str(s) / 'default'
        csv = (d / 'eval.csv').read_text().splitlines()
        assert csv[0] == 'step,episode_reward,episode_success'
        assert len(csv) >= 2
        assert (d / 'models' / 'latest.pkl').exists()
    # the per-seed checkpoint loads into a plain single-seed agent
    single = TDMPC2(cfg.replace(seed=SEEDS[0], use_pallas=False))
    extra = single.load(
        str(tmp_path / 'logs' / 'toy-reach' / str(SEEDS[0]) / 'default'
            / 'models' / 'latest.pkl'))
    assert int(extra['step']) >= cfg.steps

    # resume: a fresh fleet picks up every seed's checkpoint and step counter
    cfg2 = cfg.replace(resume=True)
    agent2 = FleetAgent(cfg2, SEEDS)
    env2 = make_fleet_env(cfg2, SEEDS)
    loggers2 = [Logger(cfg2.replace(seed=s, work_dir=str(agent2.work_dir(k))))
                for k, s in enumerate(SEEDS)]
    tr2 = FleetOnlineTrainer(cfg=cfg2, env=env2, agent=agent2,
                             buffer=FleetBuffer(cfg2, len(SEEDS)),
                             loggers=loggers2)
    tr2.maybe_resume()
    assert tr2._step >= cfg.steps
    tree_allclose(agent2.seed_state(0).params, single.state.params,
                  rtol=0, atol=0)


@pytest.mark.slow
def test_fleet_episodic_update_step_ratio(tmp_path, monkeypatch):
    """Episodic fleet runs owe no updates once warmed up (VERDICT r3 #7).

    Updates are gated on the min-across-seeds buffer fill, so every seed's
    gradient updates stall until the slowest seed flushes its first episode.
    The trainer must accrue that stall as a deficit and drain it (at 2x
    rate / folded into the pretrain burst) so the session-total
    update:env-step ratio returns to the reference's exact 1:1
    (tdmpc2/trainer/online_trainer.py:107-116)."""
    monkeypatch.chdir(tmp_path)
    from tdmpc2_tpu.envs import make_fleet_env
    from tdmpc2_tpu.trainer.fleet_online import FleetOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    cfg = parse_cfg(Config(task='toy-reach-episodic'))
    cfg.episodic = True
    cfg.steps = 200
    cfg.eval_freq = 10 ** 9     # no eval interruptions
    cfg.eval_episodes = 1
    cfg.batch_size = 8
    cfg.enc_dim = 32
    cfg.mlp_dim = 32
    cfg.latent_dim = 16
    cfg.num_q = 2
    cfg.num_samples = 16
    cfg.num_elites = 4
    cfg.num_pi_trajs = 2
    cfg.iterations = 1
    cfg.num_envs = 2
    cfg.save_video = False
    env = make_fleet_env(cfg, SEEDS)
    # seed phase ends at step 20 = iteration 10, long before the first
    # 50-step episode timeout -> a guaranteed gate-closed window in which
    # updates are owed (episodes can also terminate early on success,
    # staggering the per-seed flushes)
    cfg.seed_steps = 20
    agent = FleetAgent(cfg, SEEDS)
    buffer = FleetBuffer(cfg, len(SEEDS))
    loggers = [Logger(cfg.replace(seed=s, work_dir=str(agent.work_dir(k))))
               for k, s in enumerate(SEEDS)]
    trainer = FleetOnlineTrainer(cfg=cfg, env=env, agent=agent,
                                 buffer=buffer, loggers=loggers)
    trainer.train()
    assert trainer._update_deficit == 0, 'owed updates were never made up'
    # 1:1 after warmup: per-seed updates == per-seed env steps (the final
    # loop iteration may end between the update and the env step)
    assert abs(trainer._n_updates - trainer._step) <= cfg.num_envs


def test_fleet_buffer_partial_flush_padded_block():
    """A partial flush (fewer finished episodes than num_envs) is padded to
    one full-block write: num_eps advances by the real count, pad slots are
    never sampled (zero valid rows) and are overwritten by the next add."""
    cfg = make_cfg(num_envs=4)
    buf = FleetBuffer(cfg, 1)
    rows = EP_LEN + 1

    def eps(n, value):
        return dict(
            obs=np.full((n, rows, OBS_DIM), value, np.float32),
            action=np.zeros((n, rows, ACT_DIM), np.float32),
            reward=np.full((n, rows), value, np.float32),
            terminated=np.zeros((n, rows), np.float32))

    # 1 episode into a block of 4 -> padded write, count 1
    assert buf.add(0, eps(1, 7.0)) == 1
    assert int(np.asarray(buf._ep_rows)[0, 0]) == rows
    np.testing.assert_array_equal(np.asarray(buf._ep_rows)[0, 1:4], 0)
    # samples must come exclusively from the real episode
    _, _, reward, _, _ = buf.sample_many(1)
    np.testing.assert_array_equal(np.asarray(reward), 7.0)
    # next add overwrites the pad slots
    assert buf.add(0, eps(3, 9.0)) == 4
    erows = np.asarray(buf._ep_rows)[0]
    np.testing.assert_array_equal(erows[:4], rows)
    _, _, reward, _, _ = buf.sample_many(1)
    seen = set(np.unique(np.asarray(reward)).tolist())
    assert seen <= {7.0, 9.0} and 9.0 in seen


@pytest.mark.slow
def test_fleet_resume_restores_buffer_snapshot(tmp_path, monkeypatch):
    """cfg.buffer_snapshot_eps on a fleet run writes fleet_buffer.npz next
    to seed 0's checkpoint; a resumed fleet restores it and gains refill
    credit (the resume-with-empty-buffer destabilization class)."""
    monkeypatch.chdir(tmp_path)
    from tdmpc2_tpu.envs import make_fleet_env
    from tdmpc2_tpu.trainer.fleet_online import FleetOnlineTrainer
    from tdmpc2_tpu.utils.logger import Logger

    def small(cfg):
        cfg.eval_freq = 100
        cfg.eval_episodes = 1
        cfg.batch_size = 8
        cfg.enc_dim = 32
        cfg.mlp_dim = 32
        cfg.latent_dim = 16
        cfg.num_q = 2
        cfg.num_samples = 16
        cfg.num_elites = 4
        cfg.num_pi_trajs = 2
        cfg.iterations = 1
        cfg.num_envs = 2
        cfg.save_video = False
        cfg.buffer_snapshot_eps = 2
        return cfg

    cfg = small(parse_cfg(Config(task='toy-reach')))
    cfg.steps = 150
    env = make_fleet_env(cfg, SEEDS)
    cfg.seed_steps = 20
    agent = FleetAgent(cfg, SEEDS)
    loggers = [Logger(cfg.replace(seed=s, work_dir=str(agent.work_dir(k))))
               for k, s in enumerate(SEEDS)]
    tr = FleetOnlineTrainer(cfg=cfg, env=env, agent=agent,
                            buffer=FleetBuffer(cfg, len(SEEDS)),
                            loggers=loggers)
    tr.train()
    snap = agent.work_dir(0) / 'models' / 'fleet_buffer.npz'
    assert snap.exists()

    cfg2 = small(parse_cfg(Config(task='toy-reach')))
    cfg2.steps = 200
    cfg2.resume = True
    cfg2.resume_refill_steps = 30
    env2 = make_fleet_env(cfg2, SEEDS)
    cfg2.seed_steps = 20
    agent2 = FleetAgent(cfg2, SEEDS)
    loggers2 = [Logger(cfg2.replace(seed=s, work_dir=str(agent2.work_dir(k))))
                for k, s in enumerate(SEEDS)]
    tr2 = FleetOnlineTrainer(cfg=cfg2, env=env2, agent=agent2,
                             buffer=FleetBuffer(cfg2, len(SEEDS)),
                             loggers=loggers2)
    tr2.maybe_resume()
    assert getattr(tr2, '_refill_credit', 0) >= 30
    assert tr2.buffer.num_eps >= 2
    assert tr2._refill_done()
