"""Property tests for the pure math kernels (SURVEY.md §4 unit strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu.ops import math as m

NUM_BINS, VMIN, VMAX = 101, -10.0, 10.0


def test_symlog_symexp_inverse():
    x = jnp.linspace(-50, 50, 201)
    # fp32 exp/log round-trip at |x|~50 carries ~1e-4 relative error
    np.testing.assert_allclose(m.symexp(m.symlog(x)), x, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(m.symlog(m.symexp(x / 10)), x / 10, rtol=1e-4, atol=1e-6)


def test_two_hot_is_a_distribution():
    x = jnp.array([[-5.0], [0.0], [0.13], [3.7], [1e4], [-1e4]])
    t = m.two_hot(x, NUM_BINS, VMIN, VMAX)
    assert t.shape == (6, NUM_BINS)
    np.testing.assert_allclose(np.sum(np.asarray(t), -1), 1.0, atol=1e-5)
    assert np.all(np.asarray(t) >= 0)
    # at most two adjacent non-zero entries
    nz = np.count_nonzero(np.asarray(t) > 1e-7, axis=-1)
    assert np.all(nz <= 2)


def test_two_hot_roundtrip():
    x = jnp.array([[-8.0], [-1.0], [0.0], [0.5], [2.3], [7.9]])
    t = m.two_hot(x, NUM_BINS, VMIN, VMAX)
    bins = jnp.linspace(VMIN, VMAX, NUM_BINS)
    decoded = m.symexp(jnp.sum(t * bins, -1, keepdims=True))
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_two_hot_inv_of_sharp_logits():
    x = jnp.array([[1.7], [-0.4]])
    t = m.two_hot(x, NUM_BINS, VMIN, VMAX)
    logits = jnp.log(t + 1e-12)  # softmax(log t) == t, so decode inverts encode
    out = m.two_hot_inv(logits, NUM_BINS, VMIN, VMAX)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_two_hot_degenerate_bins():
    x = jnp.array([[0.7]])
    assert m.two_hot(x, 0, VMIN, VMAX) is x
    np.testing.assert_allclose(m.two_hot(x, 1, VMIN, VMAX), m.symlog(x))
    np.testing.assert_allclose(m.two_hot_inv(m.symlog(x), 1, VMIN, VMAX), x, rtol=1e-6)


def test_soft_ce_matches_manual():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (4, NUM_BINS))
    target = jnp.array([[0.3], [-2.0], [5.0], [0.0]])
    ce = m.soft_ce(logits, target, NUM_BINS, VMIN, VMAX)
    t = m.two_hot(target, NUM_BINS, VMIN, VMAX)
    manual = -np.sum(np.asarray(t) * np.asarray(jax.nn.log_softmax(logits, -1)), -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ce), manual, rtol=1e-5, atol=1e-6)


def test_gaussian_logprob_matches_normal_pdf():
    eps = jnp.array([[0.5, -1.2, 0.0]])
    log_std = jnp.array([[0.1, -0.3, 0.7]])
    lp = m.gaussian_logprob(eps, log_std)
    # eps is the standardized residual: logpdf = -0.5 eps^2 - log_std - log sqrt(2pi)
    expected = np.sum(-0.5 * np.asarray(eps) ** 2 - np.asarray(log_std)
                      - 0.5 * np.log(2 * np.pi), -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)


def test_squash_log_det():
    mu = jnp.array([[0.2, -0.8]])
    pi = jnp.array([[0.5, 1.5]])
    lp = jnp.zeros((1, 1))
    mu2, pi2, lp2 = m.squash(mu, pi, lp)
    np.testing.assert_allclose(np.asarray(pi2), np.tanh(np.asarray(pi)), rtol=1e-6)
    expected = -np.sum(np.log(np.clip(1 - np.tanh(np.asarray(pi)) ** 2, 0, None) + 1e-6),
                       -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lp2), expected, rtol=1e-5)


def test_log_std_bounds():
    x = jnp.array([-100.0, 0.0, 100.0])
    out = m.log_std(x, -10.0, 12.0)
    assert float(out[0]) == pytest.approx(-10.0, abs=1e-4)
    assert float(out[2]) == pytest.approx(2.0, abs=1e-4)
    assert float(out[1]) == pytest.approx(-4.0, abs=1e-5)


def test_gumbel_sample_follows_distribution():
    p = jnp.array([0.05, 0.05, 0.8, 0.1])
    keys = jax.random.split(jax.random.PRNGKey(1), 2000)
    idx = jax.vmap(lambda k: m.gumbel_softmax_sample(k, p))(keys)
    counts = np.bincount(np.asarray(idx), minlength=4) / 2000
    np.testing.assert_allclose(counts, np.asarray(p), atol=0.05)


def test_percentile_range_matches_numpy():
    x = jax.random.normal(jax.random.PRNGKey(2), (256, 1))
    p5, p95 = m.percentile_range(x)
    np.testing.assert_allclose(
        float(p5[0]), np.percentile(np.asarray(x), 5, method='linear'), rtol=1e-5)
    np.testing.assert_allclose(
        float(p95[0]), np.percentile(np.asarray(x), 95, method='linear'), rtol=1e-5)


def test_termination_statistics():
    pred = jnp.array([[0.9], [0.1], [0.8], [0.2]])
    target = jnp.array([[1.0], [1.0], [0.0], [0.0]])
    stats = m.termination_statistics(pred, target)
    assert float(stats['termination_rate']) == pytest.approx(0.5)
    # tp=1, fn=1, fp=1 -> precision=0.5, recall=0.5, f1=0.5
    assert float(stats['termination_f1']) == pytest.approx(0.5, abs=1e-6)


def test_running_scale_update():
    """ops/scale.py: EMA toward the 5-95 percentile range, floored at 1
    (reference common/scale.py:21-42)."""
    import jax.numpy as jnp
    from tdmpc2_tpu.ops.scale import update_scale
    qs = jnp.linspace(0.0, 100.0, 101)[:, None]  # p95-p5 = 90
    s0 = jnp.asarray(1.0)
    s1 = update_scale(s0, qs, tau=0.01)
    assert np.isclose(float(s1), 1.0 + 0.01 * (90.0 - 1.0))
    # floor at 1 for degenerate ranges
    s2 = update_scale(jnp.asarray(5.0), jnp.zeros((16, 1)), tau=0.5)
    assert np.isclose(float(s2), 5.0 + 0.5 * (1.0 - 5.0))
