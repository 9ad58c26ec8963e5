"""tdmpc2_tpu — a TPU-native (JAX/XLA/Pallas) model-based RL framework.

A from-scratch reimplementation of the capabilities of TD-MPC2
(reference: nicklashansen/tdmpc2), designed TPU-first:

- The MPPI planner is a single jit-compiled kernel (`lax.fori_loop` over
  iterations, `lax.scan` over the horizon, batched over all sampled action
  trajectories) with zero host round-trips inside the planning loop.
- The world model is a functional param-pytree; the Q-ensemble is a stacked
  leading param axis evaluated with `jax.vmap` (batched matmuls on the MXU).
- The training update is one jitted, donated function: TD targets under
  `stop_gradient`, `lax.scan` over the latent rollout, two optax optimizers,
  and Polyak target updates.
- The replay buffer is device-resident (HBM) when it fits, with episode-aware
  slice sampling executed on device.
- Multi-device scaling is expressed with `jax.sharding.Mesh` + NamedSharding
  (data-parallel batch axis, FSDP-style param axis), not hand-written
  collectives.
"""

__version__ = "0.1.0"

from tdmpc2_tpu.config import Config, parse_cfg  # noqa: F401
