import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.models.world_model import WorldModel


def make_cfg(**kw):
    cfg = Config()
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg = parse_cfg(cfg)
    cfg.obs_shape = kw.get('obs_shape', {'state': (24,)})
    cfg.action_dim = kw.get('action_dim', 6)
    cfg.episode_length = 500
    return cfg


@pytest.fixture(scope='module')
def wm_and_params():
    cfg = make_cfg(task='walker-walk')
    wm = WorldModel(cfg)
    params = wm.init(jax.random.PRNGKey(0))
    return cfg, wm, params


def test_param_count_close_to_5M(wm_and_params):
    """Default arch (enc 256, mlp 512, latent 512, 5 Qs) is the '5M' model."""
    _, wm, params = wm_and_params
    n = wm.total_params(params)
    assert 4_000_000 < n < 7_000_000, n


def test_encode_is_simnorm_simplex(wm_and_params):
    cfg, wm, params = wm_and_params
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 24))
    z = wm.encode(params, obs)
    assert z.shape == (4, cfg.latent_dim)
    g = np.asarray(z).reshape(4, -1, cfg.simnorm_dim)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)


def test_next_dynamics(wm_and_params):
    cfg, wm, params = wm_and_params
    z = wm.encode(params, jnp.ones((4, 24)))
    a = jnp.zeros((4, cfg.action_dim))
    z2 = wm.next(params, z, a)
    assert z2.shape == z.shape
    g = np.asarray(z2).reshape(4, -1, cfg.simnorm_dim)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)


def test_reward_zero_init_head(wm_and_params):
    cfg, wm, params = wm_and_params
    z = wm.encode(params, jnp.ones((4, 24)))
    a = jnp.zeros((4, cfg.action_dim))
    r_logits = wm.reward(params, z, a)
    assert r_logits.shape == (4, cfg.num_bins)
    np.testing.assert_array_equal(np.asarray(r_logits), 0.0)  # zero-init output


def test_pi_action_bounds_and_entropy(wm_and_params):
    cfg, wm, params = wm_and_params
    z = wm.encode(params, jax.random.normal(jax.random.PRNGKey(2), (8, 24)))
    a, info = wm.pi(params, z, jax.random.PRNGKey(3))
    assert a.shape == (8, cfg.action_dim)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    assert np.all(np.abs(np.asarray(info['mean'])) <= 1.0)
    assert np.all(np.isfinite(np.asarray(info['entropy'])))
    # log_std within configured bounds
    ls = np.asarray(info['log_std'])
    assert ls.min() >= cfg.log_std_min - 1e-5 and ls.max() <= cfg.log_std_max + 1e-5


def test_Q_all_and_subsampled(wm_and_params):
    cfg, wm, params = wm_and_params
    z = wm.encode(params, jax.random.normal(jax.random.PRNGKey(4), (8, 24)))
    a = jnp.zeros((8, cfg.action_dim))
    q_all = wm.Q(params, z, a, return_type='all')
    assert q_all.shape == (cfg.num_q, 8, cfg.num_bins)
    q_min = wm.Q(params, z, a, key=jax.random.PRNGKey(5), return_type='min')
    q_avg = wm.Q(params, z, a, key=jax.random.PRNGKey(5), return_type='avg')
    assert q_min.shape == (8, 1) and q_avg.shape == (8, 1)
    assert np.all(np.asarray(q_min) <= np.asarray(q_avg) + 1e-6)


def test_Q_target_params_used(wm_and_params):
    cfg, wm, params = wm_and_params
    z = wm.encode(params, jax.random.normal(jax.random.PRNGKey(6), (4, 24)))
    a = jnp.zeros((4, cfg.action_dim))
    tgt = jax.tree.map(lambda x: x + 0.1, params['Qs'])
    q_online = wm.Q(params, z, a, return_type='all')
    q_target = wm.Q(params, z, a, return_type='all', target_params=tgt)
    assert not np.allclose(np.asarray(q_online), np.asarray(q_target))


def test_multitask_embedding_and_masks():
    cfg = make_cfg(task='mt30', batch_size=8)
    cfg.obs_shape = {'state': (24,)}
    cfg.action_dim = 6
    cfg.action_dims = [6] * 15 + [4] * 15
    cfg.episode_lengths = [500] * 30
    wm = WorldModel(cfg)
    params = wm.init(jax.random.PRNGKey(0))
    assert params['task_emb']['w'].shape == (30, cfg.task_dim)
    # action mask zeroes trailing dims for tasks with smaller action spaces
    np.testing.assert_array_equal(np.asarray(wm.action_masks[20]), [1, 1, 1, 1, 0, 0])
    task = jnp.array([0, 20, 5, 29])
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 24))
    z = wm.encode(params, obs, task)
    assert z.shape == (4, cfg.latent_dim)
    a, info = wm.pi(params, z, jax.random.PRNGKey(2), task)
    # masked action dims are exactly tanh(0)=0 for task 20
    np.testing.assert_array_equal(np.asarray(a[1, 4:]), 0.0)
    # 3-D input broadcasting ([T, B, L])
    zs = jnp.stack([z, z])
    a2, _ = wm.pi(params, zs, jax.random.PRNGKey(3), task)
    assert a2.shape == (2, 4, cfg.action_dim)


def test_rgb_encoder_path():
    cfg = make_cfg(task='walker-walk', obs='rgb',
                   obs_shape={'rgb': (9, 64, 64)})
    wm = WorldModel(cfg)
    params = wm.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2, 9, 64, 64), jnp.uint8)
    z = wm.encode(params, obs, key=jax.random.PRNGKey(1))
    assert z.shape == (2, 512)
    # 5-D [T, B, C, H, W] input vmaps over time (reference world_model.py:110-111)
    obs5 = jnp.zeros((3, 2, 9, 64, 64), jnp.uint8)
    z5 = wm.encode(params, obs5, key=jax.random.PRNGKey(2))
    assert z5.shape == (3, 2, 512)
