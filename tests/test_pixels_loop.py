"""End-to-end pixel-observation training: uint8 frame-stack obs through
buffer, conv encoder + ShiftAug, planner and update (SURVEY.md §7 step 7)."""

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.envs.base import Env, NormalizeInfo, Timeout
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.trainer import OnlineTrainer
from tdmpc2_tpu.utils.logger import Logger



pytestmark = pytest.mark.slow  # pixel training loop e2e

class _FakePixelEnv(Env):
    """3-frame-stacked 32x32 RGB obs (channel-first uint8, the DMControl
    pixel layout) with a simple brightness-seeking reward."""

    def __init__(self, seed=0, size=32):
        class _Box:
            shape = (2,)

            def sample(_):
                return self._rng.uniform(-1, 1, 2).astype(np.float32)
        self._rng = np.random.default_rng(seed)
        self._size = size
        self.action_space = _Box()

        class _Obs:
            shape = (9, size, size)
        self.observation_space = _Obs()
        self.max_episode_steps = 12

    def _frame(self):
        v = int(np.clip(self._state, 0, 1) * 255)
        return np.full((3, self._size, self._size), v, np.uint8)

    def reset(self):
        self._state = float(self._rng.uniform())
        f = self._frame()
        return np.concatenate([f, f, f])

    def step(self, action):
        self._state = float(np.clip(
            self._state + 0.1 * float(action[0]), 0, 1))
        f = self._frame()
        obs = np.concatenate([f, f, f])
        return obs, self._state, False, {}


def test_pixel_training_loop(tmp_path):
    cfg = parse_cfg(Config(
        task='toy-reach', obs='rgb', batch_size=4, latent_dim=None,
        num_channels=4, mlp_dim=32, enc_dim=32, num_q=2, num_bins=5,
        num_samples=8, num_elites=4, num_pi_trajs=2, iterations=1,
        horizon=3, steps=60, eval_freq=1000, eval_episodes=1,
        save_agent=False, save_csv=False))
    cfg.work_dir = str(tmp_path)
    env = NormalizeInfo(Timeout(_FakePixelEnv(), max_episode_steps=12))
    cfg.obs_shape = {'rgb': (9, 32, 32)}
    cfg.action_dim = 2
    cfg.episode_length = 12
    # conv output for 32x32 input with 4 channels: latent = flattened conv
    from tdmpc2_tpu.models import layers
    import jax
    probe = layers.conv_encoder_init(jax.random.PRNGKey(0), 9, 4)
    out = layers.conv_encoder_apply(
        probe, np.zeros((1, 9, 32, 32), np.float32), simnorm_dim=2)
    cfg.latent_dim = out.shape[-1]
    cfg.simnorm_dim = 2
    cfg.seed_steps = 30

    agent = TDMPC2(cfg)
    buffer = Buffer(cfg)
    logger = Logger(cfg)
    OnlineTrainer(cfg=cfg, env=env, agent=agent, buffer=buffer,
                  logger=logger).train()
    assert buffer.num_eps >= 3
    obs, *_ = buffer.sample()
    # storage is uint8; sampled batches are pre-cast to f32 (TPU layout)
    assert obs.dtype == np.float32 and obs.shape[2:] == (9, 32, 32)
    assert float(np.max(np.asarray(obs))) <= 255.0
    a = agent.act(env.reset(), t0=True, eval_mode=True)
    assert a.shape == (2,) and np.all(np.abs(a) <= 1)


def test_pixel_vec_training_loop_fused(tmp_path):
    """Vectorized pixel collection through the fused megastep: uint8
    frame-stack obs planned per env + replay-sampled + updated in one
    dispatch (the configuration pixel fleet runs use on chip)."""
    from tdmpc2_tpu.envs.vec import VecEnv
    from tdmpc2_tpu.trainer import VecOnlineTrainer

    cfg = parse_cfg(Config(
        task='toy-reach', obs='rgb', batch_size=4, latent_dim=None,
        num_channels=4, mlp_dim=32, enc_dim=32, num_q=2, num_bins=5,
        num_samples=8, num_elites=4, num_pi_trajs=2, iterations=1,
        horizon=3, steps=80, eval_freq=1000, eval_episodes=1,
        num_envs=2, buffer_device='device',
        save_agent=False, save_csv=False))
    cfg.work_dir = str(tmp_path)
    env = VecEnv([
        NormalizeInfo(Timeout(_FakePixelEnv(seed=i), max_episode_steps=12))
        for i in range(2)])
    cfg.obs_shape = {'rgb': (9, 32, 32)}
    cfg.action_dim = 2
    cfg.episode_length = 12
    from tdmpc2_tpu.models import layers
    import jax
    probe = layers.conv_encoder_init(jax.random.PRNGKey(0), 9, 4)
    out = layers.conv_encoder_apply(
        probe, np.zeros((1, 9, 32, 32), np.float32), simnorm_dim=2)
    cfg.latent_dim = out.shape[-1]
    cfg.simnorm_dim = 2
    cfg.seed_steps = 30

    agent = TDMPC2(cfg)
    buffer = Buffer(cfg)
    VecOnlineTrainer(cfg=cfg, env=env, agent=agent, buffer=buffer,
                     logger=Logger(cfg)).train()
    assert (agent._upd_fused_jit is not None
            or agent._megastep_jit is not None)  # a fused path was exercised
    assert buffer.num_eps >= 3
    obs, *_ = buffer.sample()
    assert obs.dtype == np.float32 and obs.shape[2:] == (9, 32, 32)
