"""Running Q-value scale (functional).

Equivalent of the reference's RunningScale module (reference:
tdmpc2/common/scale.py:7-50): tracks an EMA of the 5th-95th interpolated
percentile range of first-step Q-values and divides the policy loss's Q term
by it. Here the scale is a scalar carried in the agent's TrainState and
updated inside the jitted training step — no module state, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdmpc2_tpu.ops.math import percentile_range


def update_scale(scale, qs, tau: float):
    """One EMA step toward the 5-95 percentile range of `qs`.

    qs: [N, ...] Q-values of the t=0 slice (reference scale.py:39-42,
    tdmpc2.py:221-222); range is floored at 1. Not differentiated.
    """
    p5, p95 = percentile_range(qs)
    rng = jnp.maximum(jnp.asarray(p95 - p5).reshape(-1)[0], 1.0)
    new_scale = scale + tau * (rng - scale)
    return jax.lax.stop_gradient(new_scale)
