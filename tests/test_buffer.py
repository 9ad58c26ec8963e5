import numpy as np

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer


def make_cfg(ep_len=20, horizon=3, batch=16, buffer_size=500, steps=10_000):
    cfg = parse_cfg(Config(task='toy'))
    cfg.episode_length = ep_len
    cfg.horizon = horizon
    cfg.batch_size = batch
    cfg.buffer_size = buffer_size
    cfg.steps = steps
    return cfg


def make_episode(ep_len, obs_dim=5, act_dim=2, ep_id=0):
    """Episode layout mirrors the trainer: rows = ep_len+1, row 0 has NaN
    action/reward (reference online_trainer.py:54-72)."""
    rows = ep_len + 1
    obs = np.full((rows, obs_dim), ep_id, np.float32) + np.arange(rows)[:, None] / 100
    action = np.full((rows, act_dim), ep_id + 0.5, np.float32)
    action[0] = np.nan
    reward = np.full((rows,), float(ep_id), np.float32)
    reward[0] = np.nan
    terminated = np.zeros((rows,), np.float32)
    terminated[0] = np.nan
    return dict(obs=obs, action=action, reward=reward, terminated=terminated)


def test_add_and_sample_shapes():
    cfg = make_cfg()
    buf = Buffer(cfg)
    for i in range(3):
        buf.add(make_episode(20, ep_id=i))
    assert buf.num_eps == 3
    obs, action, reward, terminated, task = buf.sample()
    T, B = cfg.horizon, cfg.batch_size
    assert obs.shape == (T + 1, B, 5)
    assert action.shape == (T, B, 2)
    assert reward.shape == (T, B, 1)
    assert terminated.shape == (T, B, 1)
    assert task is None


def test_sample_never_contains_nan():
    """The NaN bootstrap row's action/reward must never be consumed."""
    cfg = make_cfg(batch=64)
    buf = Buffer(cfg)
    buf.add(make_episode(20))
    for _ in range(20):
        obs, action, reward, terminated, _ = buf.sample()
        assert np.all(np.isfinite(np.asarray(action)))
        assert np.all(np.isfinite(np.asarray(reward)))
        assert np.all(np.isfinite(np.asarray(terminated)))


def test_slices_do_not_cross_episodes():
    """All rows of a slice must come from one episode (obs encodes ep id)."""
    cfg = make_cfg(batch=64)
    buf = Buffer(cfg)
    for i in range(5):
        buf.add(make_episode(20, ep_id=i))
    for _ in range(10):
        obs, action, reward, _, _ = buf.sample()
        ep_of_obs = np.floor(np.asarray(obs)[..., 0])       # [T+1, B]
        assert np.all(ep_of_obs == ep_of_obs[0:1])          # constant over time
        # actions/rewards belong to the same episode
        np.testing.assert_array_equal(np.asarray(reward)[..., 0],
                                      ep_of_obs[:-1])


def test_ring_overwrite():
    cfg = make_cfg(buffer_size=60)  # 3 episodes of 20 steps
    buf = Buffer(cfg)
    for i in range(5):
        buf.add(make_episode(20, ep_id=i))
    assert buf.num_eps == 5
    # only episodes 2,3,4 remain (0,1 overwritten)
    seen = set()
    for _ in range(30):
        obs, *_ = buf.sample()
        seen |= set(np.floor(np.asarray(obs)[0, :, 0]).astype(int).tolist())
    assert seen <= {2, 3, 4}
    assert len(seen) == 3


def test_variable_length_episodes():
    """Episodic mode: shorter episodes are padded; slices stay in valid rows."""
    cfg = make_cfg(batch=64)
    buf = Buffer(cfg)
    ep = make_episode(8)  # only 9 valid rows of 21
    ep['valid_rows'] = 9
    buf.add(ep)
    for _ in range(10):
        obs, action, reward, _, _ = buf.sample()
        # row index encoded in obs fractional part: max start = 9-(3+1)=5
        frac = np.round((np.asarray(obs)[..., 0] % 1) * 100).astype(int)
        assert frac.max() <= 8
        assert np.all(np.isfinite(np.asarray(action)))


def test_task_store():
    cfg = make_cfg()
    buf = Buffer(cfg)
    for i in range(4):
        ep = make_episode(20, ep_id=i)
        ep['task'] = i + 10
        buf.add(ep)
    obs, _, _, _, task = buf.sample()
    task = np.asarray(task)
    assert task.shape == (cfg.batch_size,)
    ep_ids = np.floor(np.asarray(obs)[0, :, 0]).astype(int)
    np.testing.assert_array_equal(task, ep_ids + 10)


def test_host_storage_prefetch_path():
    """Force host (RAM) storage and check the prefetching sampler delivers
    valid batches concurrent with adds."""
    cfg = make_cfg()
    # monkeypatch the placement decision: pretend HBM is full
    import tdmpc2_tpu.data.buffer as buffer_mod
    orig = buffer_mod._device_free_bytes
    buffer_mod._device_free_bytes = lambda: 0
    try:
        buf = Buffer(cfg)
        for i in range(3):
            buf.add(make_episode(cfg.episode_length, ep_id=i))
        assert buf._on_device is False
        for _ in range(4):
            obs, action, reward, term, task = buf.sample()
            assert obs.shape[:2] == (cfg.horizon + 1, cfg.batch_size)
            # row 0 of a slice may be the NaN bootstrap row only for obs[0]?
            # no: sampled slices never include NaN rows for action/reward
            assert np.isfinite(np.asarray(action)).all()
        buf.add(make_episode(cfg.episode_length, ep_id=99))
        obs, *_ = buf.sample()
        assert np.isfinite(np.asarray(obs)).all()
        buf.close()
    finally:
        buffer_mod._device_free_bytes = orig


def test_short_episodes_dropped():
    """Episodes shorter than horizon+1 rows cannot yield a slice and are
    dropped (torchrl strict_length=True semantics, reference buffer.py:22)."""
    cfg = make_cfg(ep_len=20, horizon=3)
    buf = Buffer(cfg)
    ep = make_episode(20)
    buf.add({**ep, 'valid_rows': 3})    # < horizon+1 -> dropped
    assert buf.num_eps == 0
    buf.add({**ep, 'valid_rows': 4})    # == horizon+1 -> kept
    assert buf.num_eps == 1
    obs, action, *_ = buf.sample()
    # the only valid start is 0: action rows 1..3, never the NaN row
    assert np.isfinite(np.asarray(action)).all()


def _pixel_episode(ep_len, c=3, hw=4, fs=3):
    """Value-coded pixel episode: frame at row r is all-r; the stacked obs at
    row r is [f_max(r-2,0), f_max(r-1,0), f_r] (envs/dmcontrol.py PixelObs
    semantics, including the repeated first frame at reset)."""
    rows = ep_len + 1
    frames = np.arange(rows, dtype=np.uint8)[:, None, None, None] * np.ones(
        (rows, c, hw, hw), np.uint8)
    obs = np.concatenate(
        [frames[np.maximum(np.arange(rows) - k, 0)] for k in (2, 1, 0)], axis=1)
    action = np.zeros((rows, 2), np.float32)
    reward = np.arange(rows, dtype=np.float32)
    terminated = np.zeros((rows,), np.float32)
    return dict(obs=obs, action=action, reward=reward, terminated=terminated)


def _check_restacked(buf, fs=3, c=3):
    """Every sampled slice must carry exact [f_{t-2}, f_{t-1}, f_t] stacks
    consistent with the per-slice reward (reward at row r is r)."""
    obs, action, reward, terminated, _ = buf.sample()
    obs, reward = np.asarray(obs), np.asarray(reward)
    T = obs.shape[0] - 1
    for b in range(obs.shape[1]):
        # reward[t] corresponds to row start+1+t -> start = reward[0]-1
        start = int(reward[0, b, 0]) - 1
        for t in range(T + 1):
            r = start + t
            expect = [max(r - 2, 0), max(r - 1, 0), r]
            got = [int(obs[t, b, k * c, 0, 0]) for k in range(fs)]
            assert got == expect, (start, t, got, expect)


def test_pixel_frames_unstacked_and_restacked_device():
    cfg = make_cfg(ep_len=20, horizon=3, batch=8)
    cfg.obs = 'rgb'
    buf = Buffer(cfg)
    for _ in range(3):
        buf.add(_pixel_episode(20))
    # storage holds single FLAT frames ([rows, c*H*W]), not stacks
    assert buf._storage['obs'].shape[2:] == (3 * 4 * 4,)
    assert buf._on_device
    _check_restacked(buf)


def test_pixel_frames_unstacked_and_restacked_host(monkeypatch):
    import tdmpc2_tpu.data.buffer as buffer_mod
    monkeypatch.setattr(buffer_mod, '_device_free_bytes', lambda: 0)
    cfg = make_cfg(ep_len=20, horizon=3, batch=8)
    cfg.obs = 'rgb'
    buf = Buffer(cfg)
    for _ in range(3):
        buf.add(_pixel_episode(20))
    assert not buf._on_device
    assert buf._storage['obs'].shape[2:] == (3 * 4 * 4,)
    _check_restacked(buf)
    # sample_many host path: one vectorized gather, same contract
    obs, action, reward, terminated, _ = buf.sample_many(2)
    assert obs.shape == (2, 4, 8, 9, 4, 4)
    buf.close()


def test_slice_uniform_sampling_variable_lengths():
    """Episode choice must be weighted by valid-start count (torchrl
    SliceSampler semantics): a 2x-longer episode is sampled ~2x as often."""
    cfg = make_cfg(ep_len=40, horizon=3, batch=64)
    cfg.episodic = True
    buf = Buffer(cfg)
    short, long_ = 11, 41  # valid starts: rows - horizon = 9 vs 39
    ep = make_episode(40)
    buf.add({k: (v[:short] if v.ndim == 1 else v[:short]) for k, v in ep.items()}
            | dict(valid_rows=short))
    buf.add(dict(ep, valid_rows=long_))
    # test both draw helpers' distributions directly
    import jax
    for which in ('host', 'device'):
        if which == 'host':
            ep_idx, start = buf._draw_slices_host(2, 200_000)
        else:
            ep_idx, start = buf._draw_slices_device(
                jax.random.PRNGKey(0), np.asarray(buf._ep_rows),
                np.int32(2), 200_000)
        ep_idx, start = np.asarray(ep_idx), np.asarray(start)
        frac_long = float(np.mean(ep_idx == 1))
        w_short, w_long = short - 3, long_ - 3  # valid starts = rows - T
        expect = w_long / (w_short + w_long)
        assert abs(frac_long - expect) < 0.01, (which, frac_long, expect)
        # starts stay within each episode's valid range
        assert start[ep_idx == 0].max() == short - 4  # max_start = rows-(T+1)
        assert start[ep_idx == 1].max() == long_ - 4
        assert start.min() >= 0


def test_bulk_load_matches_per_episode_add():
    """Vectorized load() must land the same storage contents / ep_rows /
    task entries as N sequential add() calls."""
    cfg = make_cfg(buffer_size=200)
    n = 6
    eps = [make_episode(20, ep_id=i) for i in range(n)]
    stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
    stacked['task'] = np.arange(n, dtype=np.int64)

    buf_a = Buffer(make_cfg(buffer_size=200))
    for i, e in enumerate(eps):
        buf_a.add(dict(e, task=i))
    buf_b = Buffer(make_cfg(buffer_size=200))
    buf_b.load(stacked)

    assert buf_b.num_eps == buf_a.num_eps == n
    for k in buf_a._storage:
        np.testing.assert_array_equal(
            np.asarray(buf_a._storage[k]), np.asarray(buf_b._storage[k]))
    np.testing.assert_array_equal(
        np.asarray(buf_a._ep_rows), np.asarray(buf_b._ep_rows))
    np.testing.assert_array_equal(
        np.asarray(buf_a._task_store), np.asarray(buf_b._task_store))


def test_bulk_load_ring_wraparound_and_blocks():
    """Loads larger than capacity wrap the ring exactly like add()."""
    cfg = make_cfg(buffer_size=100)  # 5 episodes x 20
    buf = Buffer(cfg)
    n = 8
    eps = [make_episode(20, ep_id=i) for i in range(n)]
    stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
    buf.load(stacked)
    assert buf.num_eps == n
    # slots hold the newest episodes at their modulo positions
    cap = buf._capacity_eps
    for i in range(n - cap, n):
        slot = i % cap
        assert np.asarray(buf._storage['reward'])[slot, 1] == float(i)


def test_bulk_load_variable_lengths_and_short_drop():
    cfg = make_cfg(buffer_size=500)
    cfg.episodic = True
    buf = Buffer(cfg)
    n = 4
    eps = [make_episode(20, ep_id=i) for i in range(n)]
    stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
    valid = np.array([21, 10, 2, 15], np.int32)  # 2 is < horizon+1 -> dropped
    buf.load(dict(stacked, valid_rows=valid))
    assert buf.num_eps == 3
    got = np.asarray(buf._ep_rows)[:3]
    np.testing.assert_array_equal(got, [21, 10, 15])


def test_reserve_sizes_capacity_to_dataset():
    cfg = make_cfg(buffer_size=10_000)
    buf = Buffer(cfg)
    buf.reserve(7)
    assert buf._capacity_eps == 7
    eps = [make_episode(20, ep_id=i) for i in range(3)]
    stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
    buf.load(stacked)
    assert buf._storage['reward'].shape[0] == 7
    obs, *_ = buf.sample()
    assert np.isfinite(np.asarray(obs)).all()


def test_bulk_load_pixels_unstacked():
    cfg = make_cfg(ep_len=20, horizon=3, batch=8)
    cfg.obs = 'rgb'
    buf = Buffer(cfg)
    eps = [_pixel_episode(20) for _ in range(3)]
    stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
    buf.load(stacked)
    assert buf._storage['obs'].shape[2:] == (3 * 4 * 4,)
    _check_restacked(buf)


def test_trial_allocation_places_on_device(monkeypatch):
    """When memory_stats is unavailable (tunneled backend), auto placement
    trial-allocates in device memory instead of guessing conservatively."""
    import tdmpc2_tpu.data.buffer as buffer_mod
    monkeypatch.setattr(buffer_mod, '_device_free_bytes', lambda: None)
    monkeypatch.setattr(Buffer, '_TRIAL_HEADROOM', 1 << 20)
    buf = Buffer(make_cfg())
    buf.add(make_episode(20, ep_id=0))
    assert buf._on_device
    obs, *_ = buf.sample()
    assert np.isfinite(np.asarray(obs)).all()


def test_trial_allocation_oom_falls_back_to_host(monkeypatch):
    """A failed device trial allocation degrades to host storage (and a
    buffer_device=device override would instead raise). The failure is a
    REAL allocation error: a petabyte headroom block cannot be satisfied."""
    import tdmpc2_tpu.data.buffer as buffer_mod
    monkeypatch.setattr(buffer_mod, '_device_free_bytes', lambda: None)
    monkeypatch.setattr(Buffer, '_TRIAL_HEADROOM', 1 << 50)
    buf = Buffer(make_cfg())
    buf.add(make_episode(20, ep_id=0))
    assert buf._on_device is False
    obs, action, *_ = buf.sample()
    assert np.isfinite(np.asarray(action)).all()
    buf.close()


def test_snapshot_roundtrip_state(tmp_path):
    """save_snapshot captures the K MOST RECENT ring episodes (through a
    ring wrap) and load_snapshot restores them into a fresh buffer with
    refill-gate credit equal to the captured env steps."""
    cfg = make_cfg(ep_len=20, horizon=3, batch=4, buffer_size=100)  # 5-ep ring
    buf = Buffer(cfg)
    for i in range(7):  # wraps: ring holds ids 2..6
        buf.add(make_episode(20, ep_id=i))
    fp = tmp_path / 'buffer.npz'
    steps = buf.save_snapshot(fp, 3)
    assert steps == 3 * 20

    buf2 = Buffer(make_cfg(ep_len=20, horizon=3, batch=4, buffer_size=100))
    credit = buf2.load_snapshot(fp)
    assert credit == steps and buf2.num_eps == 3
    # only the 3 most recent episodes (ids 4, 5, 6) may appear in samples
    for _ in range(5):
        _, _, reward, _, _ = buf2.sample()
        vals = np.asarray(reward).ravel()
        ids = {int(v) for v in vals[np.isfinite(vals)]}
        assert ids <= {4, 5, 6}, ids


def test_snapshot_roundtrip_pixels(tmp_path):
    """Pixel snapshots preserve the flat uint8 frame storage and the frame
    metadata, so restored buffers restack correctly AND later env-format
    (stacked) add() calls still unstack."""
    cfg = make_cfg(ep_len=20, horizon=3, batch=8)
    cfg.obs = 'rgb'
    buf = Buffer(cfg)
    for _ in range(3):
        buf.add(_pixel_episode(20))
    fp = tmp_path / 'buffer.npz'
    buf.save_snapshot(fp, 2)

    cfg2 = make_cfg(ep_len=20, horizon=3, batch=8)
    cfg2.obs = 'rgb'
    buf2 = Buffer(cfg2)
    buf2.load_snapshot(fp)
    assert buf2.num_eps == 2
    assert buf2._storage['obs'].dtype == np.uint8
    assert buf2._storage['obs'].shape[2:] == (3 * 4 * 4,)
    _check_restacked(buf2)
    buf2.add(_pixel_episode(20))  # env-format add after restore
    _check_restacked(buf2)


def test_fleet_snapshot_roundtrip(tmp_path):
    """FleetBuffer snapshots capture every seed's most recent episodes
    (per-seed ring wrap respected) and restore per-seed: samples from the
    restored buffer must draw seed k's data only from seed k's recent
    episodes."""
    from tdmpc2_tpu.data.fleet_buffer import FleetBuffer

    K = 2

    def fleet_cfg():
        cfg = make_cfg(ep_len=20, horizon=3, batch=4, buffer_size=100)
        cfg.num_envs = 2
        return cfg

    buf = FleetBuffer(fleet_cfg(), K)
    for k in range(K):
        for i in range(7):  # 5-episode ring wraps: holds ids 2..6
            ep = make_episode(20, ep_id=100 * k + i)
            buf.add(k, {kk: v[None] for kk, v in ep.items()})
    fp = tmp_path / 'fleet_buffer.npz'
    steps = buf.save_snapshot(fp, 3)
    assert steps == 3 * 20

    buf2 = FleetBuffer(fleet_cfg(), K)
    credit = buf2.load_snapshot(fp)
    assert credit == steps and buf2.num_eps == 3
    for _ in range(4):
        _, _, reward, *_ = buf2.sample_many(1)
        reward = np.asarray(reward)                 # [K, n, T, B, 1]
        for k in range(K):
            vals = reward[k].ravel()
            ids = {int(v) for v in vals[np.isfinite(vals)]}
            assert ids <= {100 * k + 4, 100 * k + 5, 100 * k + 6}, (k, ids)
