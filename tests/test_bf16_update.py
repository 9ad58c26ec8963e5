"""bf16-compute update path (cfg.bf16_update): the training step runs its
MLP matmuls with bfloat16 operands and fp32 accumulation (models/layers.py
linear_apply), with fp32 master weights. Planner/acting keep fp32 compute.

Wiring checks on CPU: the bf16 step must produce finite losses and params
that stay within mixed-precision noise of the fp32 step (one update moves
each param by at most ~lr, so a loose atol bounds direction divergence);
acting must be byte-identical to fp32 acting (the planner path never sees
the bf16 view)."""

import numpy as np

import jax
import jax.numpy as jnp

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.tdmpc2 import TDMPC2

OBS_DIM, ACT_DIM = 6, 2


def make_cfg(**kw):
    cfg = parse_cfg(Config(task='toy'))
    cfg.obs_shape = {'state': (OBS_DIM,)}
    cfg.action_dim = ACT_DIM
    cfg.episode_length = 20
    cfg.enc_dim = 32
    cfg.mlp_dim = 32
    cfg.latent_dim = 16
    cfg.num_samples = 32
    cfg.num_elites = 4
    cfg.num_pi_trajs = 4
    cfg.iterations = 1
    cfg.batch_size = 8
    cfg.num_q = 2
    cfg.use_pallas = False
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    T, B = cfg.horizon, cfg.batch_size
    return (
        jnp.asarray(rng.standard_normal((T + 1, B, OBS_DIM)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, ACT_DIM)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32))


def test_bf16_update_close_to_fp32():
    fp = TDMPC2(make_cfg())
    bf = TDMPC2(make_cfg(bf16_update=True))
    batch = make_batch(fp.cfg)

    st_fp, info_fp = jax.jit(fp._update)(fp.state, *batch)
    st_bf, info_bf = jax.jit(bf._update)(bf.state, *batch)

    for k in ('total_loss', 'consistency_loss', 'reward_loss', 'value_loss',
              'pi_loss', 'grad_norm'):
        a, b = float(info_fp[k]), float(info_bf[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)

    # params stay fp32 master weights, and within one-update noise of fp32
    for pf, pb in zip(jax.tree.leaves(st_fp.params),
                      jax.tree.leaves(st_bf.params)):
        assert pb.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pb), atol=2e-3)


def test_bf16_update_covers_conv_encoder():
    """rgb: the conv stack runs under compute_dtype too (the pixel update is
    conv-dominated; bf16 I/O halves its HBM activation traffic). Same
    closeness contract as the state test."""
    def rgb_cfg(**kw):
        # 64x64 input with 4 channels -> 4x4x4 = 64 conv output = latent_dim
        cfg = make_cfg(num_channels=4, latent_dim=64, **kw)
        cfg.obs = 'rgb'
        cfg.obs_shape = {'rgb': (9, 64, 64)}
        return cfg

    rng = np.random.default_rng(2)
    fp = TDMPC2(rgb_cfg())
    bf = TDMPC2(rgb_cfg(bf16_update=True))
    T, B = fp.cfg.horizon, fp.cfg.batch_size
    batch = (
        jnp.asarray(rng.integers(0, 256, (T + 1, B, 9, 64, 64)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, ACT_DIM)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32))

    st_fp, info_fp = jax.jit(fp._update)(fp.state, *batch)
    st_bf, info_bf = jax.jit(bf._update)(bf.state, *batch)
    for k in ('total_loss', 'consistency_loss', 'reward_loss', 'value_loss',
              'pi_loss', 'grad_norm'):
        a, b = float(info_fp[k]), float(info_bf[k])
        assert np.isfinite(b), (k, b)
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)
    for pf, pb in zip(jax.tree.leaves(st_fp.params),
                      jax.tree.leaves(st_bf.params)):
        assert pb.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pb), atol=2e-3)


def test_bf16_acting_is_exactly_fp32():
    fp = TDMPC2(make_cfg())
    bf = TDMPC2(make_cfg(bf16_update=True))
    obs = np.random.default_rng(1).standard_normal(OBS_DIM).astype(np.float32)
    a_fp = fp.act(obs, t0=True, eval_mode=True)
    a_bf = bf.act(obs, t0=True, eval_mode=True)
    np.testing.assert_array_equal(a_fp, a_bf)
