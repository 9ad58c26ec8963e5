"""Fleet agent: K seeds of one task trained simultaneously on one chip.

No reference counterpart — the reference runs one seed per process
(tdmpc2/train.py:26-60) and its published evidence is 3 seeds x 104 tasks of
such runs (results/tdmpc2/*.csv). On TPU the seed axis is just another batch
dimension: the fleet holds ONE TrainState whose leaves carry a leading [K]
seed axis (`jax.vmap` of the single-agent init over per-seed PRNG keys), and
every hot entry point is the single-agent function vmapped over that axis:

- `act`: vmap of the batched planner (`TDMPC2._plan_vec`) over seeds — one
  dispatch plans K x N envs (params mapped per seed, unlike the env-axis
  vmap where they are shared).
- `update_many`: vmap of the fused update scan — one dispatch performs
  K x n gradient updates, each seed on its own replay draws.

Why this wins: the tunneled single-chip online loop is dispatch-latency-bound
(docs/PERFORMANCE.md), so K separate processes would serialize K round trips
per step (plus head-of-line blocking between JAX clients); the fleet pays
ONE round trip for K seeds' actions. The per-seed numerics are exactly the
single-agent numerics (tested: tests/test_fleet.py equivalence tests).

The Pallas planner kernels are disabled in fleet mode: their custom_vmap
rules keep weights unbatched by design (VMEM-resident per-program weights
cannot carry a seed axis); the XLA planner — which is ~parity in-context on
this chip — is used instead.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tdmpc2_tpu.tdmpc2 import TDMPC2


class FleetAgent:
    """K single-task agents with a seed-stacked TrainState."""

    def __init__(self, cfg, seeds, mesh=None):
        self.seeds = [int(s) for s in seeds]
        self.K = len(self.seeds)
        assert self.K >= 1 and len(set(self.seeds)) == self.K, \
            f'seeds must be distinct, got {self.seeds}'
        assert not cfg.multitask, 'fleet training is single-task online'
        assert cfg.mpc, 'fleet agent plans (mpc=true)'
        # Pallas kernels assert unbatched weights in their vmap rules; the
        # fleet maps params over seeds, so force the XLA planner.
        self.cfg = cfg.replace(use_pallas=False)
        self.mesh = mesh  # optional: shard the seed axis across devices
        self.agent = TDMPC2(self.cfg)   # template: jitted fns + cfg handle
        keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        # identical per-seed numerics to TDMPC2(cfg.replace(seed=s)): the
        # init is key-deterministic, so vmapping it over the stacked keys
        # reproduces each single-agent init exactly (tested)
        self.state = jax.vmap(self.agent._init_state)(keys)
        if mesh is not None:
            # seeds are embarrassingly parallel: each device owns
            # K/data_size seeds end-to-end, zero collectives in the hot loop
            from tdmpc2_tpu import parallel
            self.state = parallel.shard_seed_axis(self.state, mesh)

        self._act_jit = {
            em: jax.jit(jax.vmap(
                partial(self.agent._plan_vec, eval_mode=em),
                in_axes=(0, 0, 0, 0, 0, None, None)))
            for em in (False, True)}

        def update_scan_meaned(state, *batch):
            # seed-mean the metrics INSIDE the jit: one fused program, no
            # per-metric dispatches on the latency-bound tunnel
            state, infos = jax.vmap(self.agent._update_scan)(state, *batch)
            return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), infos)

        self._update_scan_jit = jax.jit(update_scan_meaned, donate_argnums=0)
        self._step_jit = None      # fused act+sample+update (step())
        self._step_buffer = None
        self._upd_fused_jit = None  # sample+update in one dispatch
        self._upd_fused_buffer = None

    # ------------------------------------------------------------------ act

    def act(self, obs, t0=False, eval_mode=False):
        """Plan actions for all seeds' envs in one device call.

        obs [K, N, ...]; t0 scalar or [K, N] -> actions [K, N, A] (numpy).
        """
        obs = jnp.asarray(obs)
        K, N = obs.shape[:2]
        assert K == self.K
        t0v = np.broadcast_to(np.asarray(t0, bool), (K, N))
        st = self.state
        a, prev_mean, keys = self._act_jit[bool(eval_mode)](
            st.params, obs, st.prev_mean, t0v, st.key, None, None)
        self.state = st.replace(prev_mean=prev_mean, key=keys)
        return np.asarray(a)

    # ------------------------------------------------------------- learning

    def update_many(self, buffer, n: int):
        """n gradient updates per seed, all fused into one device call.

        `buffer` is a FleetBuffer; its one sample dispatch yields every
        seed's n batches. Returns the last update's metrics averaged over
        seeds (per-seed curves live in the eval logs, not the train ticker);
        the mean is computed inside the jitted program.
        """
        batch = buffer.sample_many(n)
        self.state, infos = self._update_scan_jit(self.state, *batch[:-1])
        return infos

    def update_many_fused(self, buffer, n: int):
        """n updates per seed with the replay draw INSIDE the jit — one
        dispatch for all K x n gradient steps. Numerically identical to
        `update_many` (same draw stream); used by the pipelined collection
        schedule (update overlaps host physics)."""
        assert buffer.num_eps > 0, 'Cannot update: some seed has no episodes'
        if (self._upd_fused_jit is None
                or self._upd_fused_buffer is not buffer):
            self._upd_fused_buffer = buffer

            def upd(state, storage, ep_rows, n_filled, draw, *, n_batches):
                batch = buffer._sample_device(
                    storage, ep_rows, n_filled, draw, n_batches=n_batches)
                state, infos = jax.vmap(self.agent._update_scan)(
                    state, *batch[:4])
                return state, jax.tree.map(
                    lambda x: jnp.mean(x, axis=0), infos)

            self._upd_fused_jit = jax.jit(
                upd, donate_argnums=0, static_argnames=('n_batches',))
        buffer._draws += 1
        n_filled = np.minimum(
            buffer._num_eps, buffer._capacity_eps).astype(np.int32)
        self.state, infos = self._upd_fused_jit(
            self.state, buffer._storage, buffer._ep_rows, n_filled,
            np.int32(buffer._draws), n_batches=n)
        return infos

    def step(self, buffer, obs, t0, n: int):
        """Fused actor-learner step for the whole fleet: plan K x N envs +
        draw every seed's n replay batches + run K x n gradient updates, all
        inside ONE jitted dispatch (vs 3 for separate act/sample/update —
        the per-dispatch tunnel round trip dominates the online loop,
        docs/PERFORMANCE.md). Actions use the PRE-update parameters and the
        draw stream is `sample_many`'s, so the composition is numerically
        identical to `act(...)` followed by `update_many(...)` (tested:
        tests/test_fused_step.py).

        obs [K, N, ...], t0 [K, N] -> (actions [K, N, A] numpy, metrics).
        """
        assert buffer.num_eps > 0, \
            'Cannot step: some seed has no replay episodes'
        obs = jnp.asarray(obs)
        K, N = obs.shape[:2]
        assert K == self.K
        t0v = np.broadcast_to(np.asarray(t0, bool), (K, N))
        if self._step_jit is None or self._step_buffer is not buffer:
            self._step_buffer = buffer

            def megastep(state, storage, ep_rows, n_filled, draw, obs, t0,
                         *, n_batches):
                a, prev_mean, keys = jax.vmap(
                    partial(self.agent._plan_vec, eval_mode=False),
                    in_axes=(0, 0, 0, 0, 0, None, None))(
                    state.params, obs, state.prev_mean, t0, state.key,
                    None, None)
                state = state.replace(prev_mean=prev_mean, key=keys)
                batch = buffer._sample_device(
                    storage, ep_rows, n_filled, draw, n_batches=n_batches)
                state, infos = jax.vmap(self.agent._update_scan)(
                    state, *batch[:4])
                infos = jax.tree.map(lambda x: jnp.mean(x, axis=0), infos)
                return state, a, infos

            self._step_jit = jax.jit(
                megastep, donate_argnums=0, static_argnames=('n_batches',))
        buffer._draws += 1
        n_filled = np.minimum(
            buffer._num_eps, buffer._capacity_eps).astype(np.int32)
        self.state, a, infos = self._step_jit(
            self.state, buffer._storage, buffer._ep_rows, n_filled,
            np.int32(buffer._draws), obs, t0v, n_batches=n)
        return np.asarray(a), infos

    # -------------------------------------------------------- checkpointing

    def seed_state(self, k: int):
        return jax.tree.map(lambda x: x[k], self.state)

    def save_seed(self, k: int, fp, extra=None):
        """Write seed k's slice as a standard single-agent checkpoint, so
        evaluate.py / resume / torch-interop tooling work on fleet outputs
        unchanged."""
        single = self.agent
        old = single.state
        try:
            single.state = self.seed_state(k)
            single.save(fp, extra=extra)
        finally:
            single.state = old

    def load_seeds(self, fps) -> list:
        """Load one checkpoint per seed and stack them into the fleet state.
        Returns the per-seed `extra` dicts."""
        assert len(fps) == self.K
        single = self.agent
        old = single.state
        states, extras = [], []
        try:
            for k, fp in enumerate(fps):
                single.state = self.seed_state(k)
                extras.append(single.load(str(fp)))
                states.append(single.state)
        finally:
            single.state = old
        self.state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return extras

    def work_dir(self, k: int) -> Path:
        """Per-seed log directory (same layout as single-seed runs)."""
        root = Path(self.cfg.work_dir).parent.parent
        return root / str(self.seeds[k]) / self.cfg.exp_name
