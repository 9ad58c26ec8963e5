"""Pure math kernels (JAX).

Functional equivalents of the reference's math utilities
(reference: tdmpc2/common/math.py). All functions are pure, shape-polymorphic
over leading batch dims, and trace-friendly (no data-dependent python control
flow), so they fuse into the surrounding jitted planner/update kernels.

Discrete-regression (two-hot) parameters come in as plain floats/ints from the
config and are baked into the trace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.9189385175704956  # log(sqrt(2*pi)), matches reference math.py:19


def symlog(x):
    """Symmetric log: sign(x) * log(1+|x|). (reference math.py:42-47)"""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    """Inverse of symlog: sign(x) * (exp(|x|)-1). (reference math.py:50-55)"""
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def two_hot(x, num_bins: int, vmin: float, vmax: float):
    """Scalar -> soft two-hot target over `num_bins` symlog-spaced bins.

    x: [..., 1]; returns [..., num_bins]. (reference math.py:58-71)
    """
    if num_bins == 0:
        return x
    if num_bins == 1:
        return symlog(x)
    bin_size = (vmax - vmin) / (num_bins - 1)
    x = jnp.clip(symlog(x), vmin, vmax)[..., 0]
    pos = (x - vmin) / bin_size
    idx = jnp.floor(pos)
    off = (pos - idx)[..., None]
    idx = idx.astype(jnp.int32)
    lo = jax.nn.one_hot(idx, num_bins, dtype=x.dtype) * (1.0 - off)
    hi = jax.nn.one_hot((idx + 1) % num_bins, num_bins, dtype=x.dtype) * off
    return lo + hi


def two_hot_inv(logits, num_bins: int, vmin: float, vmax: float):
    """Soft two-hot logits -> scalar. logits: [..., num_bins] -> [..., 1].

    (reference math.py:74-83)
    """
    if num_bins == 0:
        return logits
    if num_bins == 1:
        return symexp(logits)
    bins = jnp.linspace(vmin, vmax, num_bins, dtype=logits.dtype)
    x = jax.nn.softmax(logits, axis=-1)
    x = jnp.sum(x * bins, axis=-1, keepdims=True)
    return symexp(x)


def soft_ce(pred_logits, target, num_bins: int, vmin: float, vmax: float):
    """Cross-entropy of predicted logits vs two-hot-encoded scalar target.

    pred_logits: [..., num_bins], target: [..., 1] -> [..., 1].
    (reference math.py:5-9)
    """
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    t = two_hot(target, num_bins, vmin, vmax)
    return -jnp.sum(t * logp, axis=-1, keepdims=True)


def log_std(x, low, dif):
    """Squash an unbounded log-std head into [low, low+dif]. (math.py:12-13)"""
    return low + 0.5 * dif * (jnp.tanh(x) + 1.0)


def gaussian_logprob(eps, log_std_):
    """Log-prob of eps under N(0, exp(log_std)^2), summed over the last axis.

    Matches the reference's elementwise-constant formulation (math.py:16-20).
    """
    residual = -0.5 * jnp.square(eps) - log_std_
    return jnp.sum(residual - _LOG_SQRT_2PI, axis=-1, keepdims=True)


def squash(mu, pi, log_pi):
    """Tanh-squash mean/sample and apply the log-det-Jacobian correction.

    (reference math.py:23-29)
    """
    mu = jnp.tanh(mu)
    pi = jnp.tanh(pi)
    correction = jnp.log(jax.nn.relu(1.0 - jnp.square(pi)) + 1e-6)
    log_pi = log_pi - jnp.sum(correction, axis=-1, keepdims=True)
    return mu, pi, log_pi


def gumbel_softmax_sample(key, p, temperature: float = 1.0):
    """Sample an index ~ Gumbel-softmax over unnormalized probabilities `p`.

    p: [N] -> scalar int32 index. (reference math.py:86-94)
    """
    logits = jnp.log(p)
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jnp.argmax((logits + g) / temperature, axis=-1)


def int_to_one_hot(x, num_classes: int):
    """Integer tensor -> one-hot; supports batched inputs. (math.py:32-39)"""
    return jax.nn.one_hot(x, num_classes)


def termination_statistics(pred, target, eps: float = 1e-9):
    """Episode-termination F1/rate diagnostics. pred/target: [..., 1].

    (reference math.py:97-109)
    """
    pred = pred[..., 0]
    target = target[..., 0]
    rate = jnp.sum(target) / target.size
    tp = jnp.sum((pred > 0.5) & (target == 1))
    fn = jnp.sum((pred <= 0.5) & (target == 1))
    fp = jnp.sum((pred > 0.5) & (target == 0))
    recall = tp / (tp + fn + eps)
    precision = tp / (tp + fp + eps)
    f1 = 2 * (precision * recall) / (precision + recall + eps)
    return {'termination_rate': rate, 'termination_f1': f1}


def percentile_range(x, lo: float = 5.0, hi: float = 95.0):
    """Interpolated (lo, hi) percentiles over axis 0 of a flattened batch.

    x: [N, ...] -> (p_lo, p_hi) each of shape [...]. Matches the reference's
    linear-interpolation percentile (tdmpc2/common/scale.py:21-37).
    """
    n = x.shape[0]
    xs = jnp.sort(x.reshape(n, -1), axis=0)
    out = []
    for p in (lo, hi):
        pos = p * (n - 1) / 100.0
        floored = int(pos)
        ceiled = min(floored + 1, n - 1)
        w_ceil = pos - floored
        out.append(xs[floored] * (1.0 - w_ceil) + xs[ceiled] * w_ceil)
    return out[0], out[1]
