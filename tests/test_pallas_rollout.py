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
    C.multitask = True
    assert not rollout_supported(C)


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
