import jax
import jax.numpy as jnp
import numpy as np

from tdmpc2_tpu.models import layers as L


def test_simnorm_simplex_property():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    y = L.simnorm(x, 8)
    assert y.shape == x.shape
    groups = np.asarray(y).reshape(4, 4, 8)
    np.testing.assert_allclose(groups.sum(-1), 1.0, atol=1e-5)
    assert np.all(groups >= 0)


def test_trunc_normal_bounds_and_scale():
    w = L.trunc_normal(jax.random.PRNGKey(0), (512, 512), std=0.02)
    w = np.asarray(w)
    assert np.abs(w).max() <= 2.0
    assert 0.015 < w.std() < 0.025


def test_normed_linear_shapes_and_mish():
    p = L.normed_linear_init(jax.random.PRNGKey(0), 16, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    y = L.normed_linear_apply(p, x)
    assert y.shape == (4, 32)
    # mish(x) >= ~-0.31 for all x
    assert float(jnp.min(y)) > -0.32


def test_mlp_structure_and_zero_final():
    p = L.mlp_init(jax.random.PRNGKey(0), 8, [32, 32], 5, zero_final=True)
    assert len(p) == 3
    assert 'ln_w' in p[0] and 'ln_w' in p[1] and 'ln_w' not in p[2]
    np.testing.assert_array_equal(np.asarray(p[2]['w']), 0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    y = L.mlp_apply(p, x)
    assert y.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(y), 0.0)  # zero head -> zero out


def test_mlp_final_act():
    p = L.mlp_init(jax.random.PRNGKey(0), 8, [16], 16, final_normed=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    y = L.mlp_apply(p, x, final_act=lambda v: L.simnorm(v, 8))
    np.testing.assert_allclose(np.asarray(y).reshape(4, 2, 8).sum(-1), 1.0, atol=1e-5)


def test_dropout_only_first_layer_and_training_gated():
    p = L.mlp_init(jax.random.PRNGKey(0), 8, [32, 32], 5)
    x = jnp.ones((4, 8))
    y1 = L.mlp_apply(p, x, dropout=0.5, key=jax.random.PRNGKey(1), training=False)
    y2 = L.mlp_apply(p, x, dropout=0.5, key=jax.random.PRNGKey(1), training=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # eval: no dropout
    y3 = L.mlp_apply(p, x, dropout=0.5, key=jax.random.PRNGKey(1), training=True)
    y4 = L.mlp_apply(p, x, dropout=0.5, key=jax.random.PRNGKey(2), training=True)
    assert not np.allclose(np.asarray(y3), np.asarray(y4))  # train: random


def test_ensemble_init_and_apply():
    init_fn = lambda k: L.mlp_init(k, 8, [16], 3)
    stacked = L.ensemble_init(jax.random.PRNGKey(0), 5, init_fn)
    assert stacked[0]['w'].shape == (5, 8, 16)
    # members differ
    w = np.asarray(stacked[0]['w'])
    assert not np.allclose(w[0], w[1])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    out = L.ensemble_apply(L.mlp_apply, stacked, x)
    assert out.shape == (5, 4, 3)
    # vmap result matches member-by-member apply
    member0 = jax.tree.map(lambda a: a[0], stacked)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(L.mlp_apply(member0, x)), rtol=1e-5, atol=1e-6)


def test_conv_encoder_output_is_512_for_64px():
    p = L.conv_encoder_init(jax.random.PRNGKey(0), 9, 32)  # 3 stacked RGB frames
    x = jnp.zeros((2, 9, 64, 64), jnp.uint8)
    y = L.conv_encoder_apply(p, x, simnorm_dim=8)
    assert y.shape == (2, 512)  # matches latent_dim for the 5M model
    np.testing.assert_allclose(np.asarray(y).reshape(2, 64, 8).sum(-1), 1.0, atol=1e-5)


def test_shift_aug_is_integer_shift():
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    y = L.shift_aug(jax.random.PRNGKey(3), x, pad=2)
    assert y.shape == x.shape
    # every output value must exist in the padded input (integer gather, no interpolation)
    xp = np.pad(np.asarray(x), ((0, 0), (2, 2), (2, 2), (0, 0)), mode='edge')
    for n in range(2):
        assert np.all(np.isin(np.asarray(y)[n], xp[n]))


def test_fast_mish_matches_analytic_form():
    """mish is implemented via tanh(log z) = (z2-1)/(z2+1), z = 1 + e^x
    (one exp instead of three transcendentals — the planner is VPU-
    transcendental-bound). Values AND gradients must match the analytic
    x*tanh(softplus(x)) across the full range including the clamp region
    (the clamp at 15 guards autodiff quotient-rule intermediates ~2z^3
    from f32 overflow, which corrupted grads for x in (22, 30) at clamp 30)."""
    import numpy as np

    def analytic(x):
        return x * jnp.tanh(jax.nn.softplus(x))

    x = jnp.asarray(np.concatenate(
        [np.linspace(-60, 60, 6001), [-1e4, -88, 8.7, 15.0, 30.0, 1e4]]),
        jnp.float32)
    v, vr = L.mish(x), analytic(x)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-5)
    g = jax.vmap(jax.grad(L.mish))(x)
    gr = jax.vmap(jax.grad(analytic))(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-5)
