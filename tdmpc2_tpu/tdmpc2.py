"""TD-MPC2 agent: jit-compiled MPPI planning + world-model learning on TPU.

Re-design of the reference agent (reference: tdmpc2/tdmpc2.py:10-349) around
two fused XLA kernels instead of torch.compile/CUDA-graph capture:

- `plan`: the full MPPI procedure — policy-prior rollouts, `lax.fori_loop`
  over CEM iterations, `lax.scan` over the horizon, batched over all
  `num_samples` trajectories — compiled once per (eval/train) mode with zero
  host round-trips inside the loop. The warm-start mean is carried through the
  TrainState (reference `_prev_mean` buffer, tdmpc2.py:40, 166-167, 205).
- `update`: one jitted, donated training step — TD targets under
  stop_gradient, scan-unrolled latent rollout, joint model loss, policy-prior
  update with running Q-scale, Polyak target update
  (reference tdmpc2.py:208-332).

All state (params, target Q params, both optimizer states, running scale,
planner warm-start, PRNG key) lives in a single TrainState pytree that is
donated through the jitted step, so the whole training state stays resident in
HBM.
"""

from __future__ import annotations

import gzip
import pickle
from functools import partial
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tdmpc2_tpu.data.buffer import _device_free_bytes
from tdmpc2_tpu.models.world_model import WorldModel
from tdmpc2_tpu.ops import math
from tdmpc2_tpu.ops import scale as scale_ops


@struct.dataclass
class TrainState:
    params: Any
    target_Qs: Any
    opt_state: Any
    pi_opt_state: Any
    scale: jnp.ndarray        # running Q-scale (reference common/scale.py)
    prev_mean: jnp.ndarray    # [H, A] MPPI warm start
    key: jax.Array


def _optim_labels(params):
    """Label tree for the model optimizer: encoder params get a scaled LR
    (reference tdmpc2.py:22-30); pi params are excluded (their own Adam)."""
    labels = {}
    for k in params:
        if k == 'encoder':
            labels[k] = jax.tree.map(lambda _: 'enc', params[k])
        elif k == 'pi':
            labels[k] = jax.tree.map(lambda _: 'pi', params[k])
        else:
            labels[k] = jax.tree.map(lambda _: 'rest', params[k])
    return labels


class TDMPC2:
    """TD-MPC2 agent. Single- and multi-task, state and pixel observations."""

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        # Optional ('data', 'model') device mesh: the TrainState is
        # FSDP-sharded over 'model' and update batches are data-parallel over
        # 'data' (no reference counterpart — the reference is single-device).
        self.mesh = mesh
        # Heuristic for large action spaces (reference tdmpc2.py:34). The
        # iteration count is static for the compiled planner; kept on the
        # agent so cfg is not mutated by construction.
        self.iterations = cfg.iterations + 2 * int(cfg.action_dim >= 20)
        self.model = WorldModel(cfg)
        # bf16-compute view of the same params for the update path only
        # (cfg.bf16_update): halves HBM weight/activation traffic of the
        # bandwidth-bound training step; planner/acting keep fp32 compute
        self.model_upd = (WorldModel(cfg, compute_dtype=jnp.bfloat16)
                          if cfg.bf16_update else self.model)

        # Fused Pallas rollout for the planner's value estimate: keeps the
        # dynamics+reward MLP weights VMEM-resident across the horizon
        # (ops/pallas_rollout.py). TPU-only; XLA scan fallback otherwise.
        from tdmpc2_tpu.ops.pallas_rollout import rollout_supported
        self._fused_rollout = bool(
            cfg.get('use_pallas', True) and rollout_supported(cfg)
            and jax.default_backend() == 'tpu')

        if cfg.multitask:
            self.discount = jnp.asarray(
                [self._get_discount(l) for l in cfg.episode_lengths],
                dtype=jnp.float32)
        else:
            self.discount = float(self._get_discount(cfg.episode_length))

        lr = cfg.lr
        self._model_tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.multi_transform(
                {'enc': optax.adam(lr * cfg.enc_lr_scale),
                 'rest': optax.adam(lr),
                 'pi': optax.set_to_zero()},
                _optim_labels),
        )
        self._pi_tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adam(lr, eps=1e-5),
        )

        self.state = self._init_state(jax.random.PRNGKey(cfg.seed))
        if mesh is not None:
            from tdmpc2_tpu import parallel
            self.state = parallel.shard_state(self.state, mesh, min_size=128)

        # Probe the fused kernel once on real hardware before committing the
        # compiled planner to it: a Mosaic lowering/runtime failure degrades
        # to the XLA planner instead of failing inside the first jitted plan.
        if self._fused_rollout:
            from tdmpc2_tpu.ops.pallas_rollout import probe_value_kernel
            self._fused_rollout = probe_value_kernel(
                self.state.params, cfg,
                self.model.log_std_min, self.model.log_std_dif)

        # Whole-CEM-loop kernel (ops/pallas_cem.py): the entire MPPI loop in
        # one program, weights loaded from HBM once per plan instead of once
        # per iteration. Fallback chain: CEM kernel -> per-iteration fused
        # value kernel -> XLA planner.
        self._fused_cem = False
        self._cem_interpret = False   # tests: run the kernel interpreted
        self._pallas_dot_dtype = jnp.bfloat16  # tests: f32 for exact parity
        self._prep_cache = None       # act()-level weight-prep cache
        self._prep_params = None
        self._prep_task = None
        self._prep_jit = jax.jit(self._prepare_value)
        if self._fused_rollout:
            from tdmpc2_tpu.ops.pallas_cem import probe_cem_kernel
            self._fused_cem = probe_cem_kernel(
                self.state.params, cfg, self.model.log_std_min,
                self.model.log_std_dif, self.iterations)

        # Compiled entry points. eval_mode is a static branch -> two planner
        # variants (reference lazily torch.compiles _plan, tdmpc2.py:45-55).
        # The vectorized planner vmaps the single-obs MPPI kernel over a
        # leading env axis (batched actor collection; no reference
        # counterpart) — jit specializes per batch size, so single-env act
        # and N-env act each compile once.
        self._plan_jit = {
            em: jax.jit(partial(self._plan, eval_mode=em)) for em in (False, True)}
        self._plan_vec_jit = {
            em: jax.jit(partial(self._plan_vec, eval_mode=em))
            for em in (False, True)}
        self._pi_act_jit = {
            em: jax.jit(partial(self._pi_act, eval_mode=em)) for em in (False, True)}
        self._update_jit = jax.jit(self._update, donate_argnums=0)
        self._update_scan_jit = jax.jit(self._update_scan, donate_argnums=0)
        self._megastep_jit = None      # fused act+sample+update (vec_step)
        self._megastep_buffer = None   # buffer the megastep was traced for
        self._plan_tasks_jit = None    # batched-over-tasks eval planner
        self._upd_fused_jit = None     # sample+update in one dispatch
        self._upd_fused_buffer = None
        self._plan_collect_jit = None  # train-time act with in-jit prep

    # ------------------------------------------------------------------ setup

    def _init_state(self, key) -> TrainState:
        kp, kk = jax.random.split(key)
        params = self.model.init(kp)
        return TrainState(
            params=params,
            target_Qs=jax.tree.map(jnp.copy, params['Qs']),
            opt_state=self._model_tx.init(params),
            pi_opt_state=self._pi_tx.init(params['pi']),
            scale=jnp.ones((), jnp.float32),
            # one warm-start mean per parallel env (leading axis; [1, H, A]
            # in the reference-equivalent single-env case)
            prev_mean=jnp.zeros(
                (max(1, int(self.cfg.get('num_envs') or 1)),
                 self.cfg.horizon, self.cfg.action_dim), jnp.float32),
            key=kk,
        )

    def _get_discount(self, episode_length):
        """Episode-length -> discount heuristic (reference tdmpc2.py:57-70)."""
        frac = episode_length / self.cfg.discount_denom
        return min(max((frac - 1) / frac, self.cfg.discount_min),
                   self.cfg.discount_max)

    def _task_discount(self, task):
        if self.cfg.multitask:
            return self.discount[task]
        return self.discount

    # ------------------------------------------------------------ checkpoints

    # cfg fields that determine the parameter pytree's structure/shapes;
    # stored in every checkpoint and validated on load (the reference fails
    # with an opaque size-mismatch error here, SURVEY.md §5.4)
    _ARCH_FIELDS = (
        'obs', 'action_dim', 'latent_dim', 'mlp_dim', 'enc_dim',
        'num_enc_layers', 'num_channels', 'num_q', 'num_bins', 'episodic',
        'multitask', 'task_dim', 'simnorm_dim', 'model_size')

    def _arch_meta(self) -> dict:
        meta = {k: self.cfg.get(k) for k in self._ARCH_FIELDS}
        meta['obs_shape'] = {k: tuple(v)
                             for k, v in dict(self.cfg.obs_shape).items()}
        meta['num_tasks'] = len(self.cfg.tasks) if self.cfg.multitask else 1
        return meta

    @staticmethod
    def _canon(v):
        """Canonicalize for comparison across pickle/orbax round-trips
        (numpy scalars -> python, lists -> tuples)."""
        if isinstance(v, dict):
            return {k: TDMPC2._canon(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return tuple(TDMPC2._canon(x) for x in v)
        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray) and v.ndim == 0:
            return v.item()
        return v

    def _check_arch(self, saved: dict):
        mine = self._canon(self._arch_meta())
        saved = self._canon(saved)
        diffs = {k: (saved.get(k), mine.get(k))
                 for k in mine if saved.get(k) != mine.get(k)}
        if diffs:
            lines = ', '.join(
                f'{k}: checkpoint={a!r} vs cfg={b!r}' for k, (a, b) in diffs.items())
            raise ValueError(
                f'checkpoint architecture does not match the configured '
                f'model ({lines}) — re-run with a matching config '
                f'(e.g. model_size/task/obs)')

    def save(self, fp, extra: Optional[dict] = None):
        """Save agent state (reference tdmpc2.py:72-79 saves model weights
        only; we save the full train state — params, target Q, both optimizer
        states, running scale, PRNG key — plus architecture metadata
        (validated on load) and optional trainer metadata (`extra`, e.g.
        step counters) so runs are preemption-resumable."""
        blob = jax.tree.map(np.asarray, {
            'model': self.state.params,
            'target_Qs': self.state.target_Qs,
            'opt_state': self.state.opt_state,
            'pi_opt_state': self.state.pi_opt_state,
            'scale': self.state.scale,
            'key': self.state.key,
        })
        blob['arch'] = self._arch_meta()
        if extra:
            blob['extra'] = dict(extra)
        fp = str(fp)
        if fp.endswith('.orbax'):
            # Orbax directory checkpoint: atomic + async-capable, the
            # preferred format for pod-scale runs (SURVEY.md §5.4)
            import orbax.checkpoint as ocp
            path = Path(fp).absolute()
            if path.exists():
                import shutil
                shutil.rmtree(path)
            path.parent.mkdir(parents=True, exist_ok=True)
            ocp.PyTreeCheckpointer().save(str(path), blob)
            return
        Path(fp).parent.mkdir(parents=True, exist_ok=True)
        with open(fp, 'wb') as f:
            pickle.dump(blob, f)

    def load(self, fp) -> dict:
        """Load agent state from a filepath or dict (reference
        tdmpc2.py:81-95). Returns the checkpoint's `extra` metadata dict.

        Accepts this repo's pickle/Orbax checkpoints AND the reference's
        published torch ``.pt`` checkpoints (old or new API key scheme —
        reference common/layers.py:167-221), which are converted into the
        native param pytree on the fly (utils/torch_interop.py)."""
        if isinstance(fp, dict):
            blob = fp
        elif str(fp).endswith('.pt'):
            from tdmpc2_tpu.utils import torch_interop
            params, target = torch_interop.load_reference_checkpoint(
                fp, self.state.params)
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, params),
                target_Qs=jax.tree.map(jnp.asarray, target))
            return {}
        elif str(fp).endswith('.orbax'):
            import orbax.checkpoint as ocp
            blob = ocp.PyTreeCheckpointer().restore(
                str(Path(str(fp)).absolute()))
        else:
            with open(fp, 'rb') as f:
                magic = f.read(2)
            # gzip-sniff: stripped policy artifacts (scripts/
            # strip_checkpoint.py) are gzipped pickles
            opener = gzip.open if magic == b'\x1f\x8b' else open
            with opener(str(fp), 'rb') as f:
                blob = pickle.load(f)
        model = blob.get('model', blob)
        if isinstance(model, dict) and any(
                str(k).startswith('_') and '.' in str(k) for k in model):
            # reference-format state_dict passed as a dict (ref tdmpc2.py:87-90)
            from tdmpc2_tpu.utils import torch_interop
            params, target = torch_interop.convert_reference_state_dict(
                blob if 'model' in blob else model, self.state.params)
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, params),
                target_Qs=jax.tree.map(jnp.asarray, target))
            return {}
        if isinstance(blob.get('arch'), dict):
            self._check_arch(blob['arch'])

        def _asarray(x):
            # stripped policy artifacts store bf16 weights; train/act in fp32
            x = jnp.asarray(x)
            return x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
        params = jax.tree.map(_asarray, blob['model'])
        target = jax.tree.map(
            _asarray, blob.get('target_Qs', params['Qs']))
        st = self.state
        updates = dict(params=params, target_Qs=target)
        if 'opt_state' in blob:
            updates['opt_state'] = jax.tree.map(jnp.asarray, blob['opt_state'])
            updates['pi_opt_state'] = jax.tree.map(jnp.asarray, blob['pi_opt_state'])
            updates['scale'] = jnp.asarray(blob['scale'])
        if 'key' in blob:
            updates['key'] = jnp.asarray(blob['key'])
        self.state = st.replace(**updates)
        return blob.get('extra', {})

    # ------------------------------------------------------------------ act

    def act(self, obs, t0=False, eval_mode=False, task=None):
        """Select action(s) by planning in latent space (reference
        tdmpc2.py:97-120). Host-facing: takes/returns numpy.

        Accepts a single observation (returns one action [A]) or a stacked
        batch of per-env observations [N, ...] (returns [N, A]) — the batched
        form plans all envs in one fused device call.
        """
        obs = jnp.asarray(obs)
        obs_rank = len(self.cfg.obs_shape[self.cfg.obs])
        single = obs.ndim == obs_rank
        if single:
            obs = obs[None]
        n = obs.shape[0]
        prep = self._cached_prep(task) if self.cfg.mpc else None
        task = jnp.asarray([task]) if task is not None else None
        st = self.state
        if self.cfg.mpc:
            # t0 broadcast on the host (numpy) — keeps act() at exactly one
            # device dispatch; all slicing/scattering happens inside the jit.
            t0v = np.broadcast_to(np.asarray(t0, bool).reshape(-1), (n,))
            a, prev_mean, key = self._plan_vec_jit[bool(eval_mode)](
                st.params, obs, st.prev_mean, t0v, st.key, task, prep)
            self.state = st.replace(prev_mean=prev_mean, key=key)
        else:
            a, key = self._pi_act_jit[bool(eval_mode)](
                st.params, obs, st.key, task)
            self.state = st.replace(key=key)
        return np.asarray(a[0] if single else a)

    def _pi_act(self, params, obs, key, task, eval_mode: bool):
        key, k_enc, k_pi, k_next = jax.random.split(key, 4)
        enc_key = k_enc if self.cfg.obs == 'rgb' else None
        z = self.model.encode(params, obs, task, key=enc_key)
        action, info = self.model.pi(params, z, k_pi, task)
        a = info['mean'] if eval_mode else action
        return a, k_next

    def _plan_vec(self, params, obs, prev_mean, t0, key, task, prep=None,
                  *, eval_mode: bool):
        """Plan for n envs in one call: vmap the MPPI kernel over the env
        axis. obs [n, ...], prev_mean [N, H, A] (full state, n <= N),
        t0 [n] -> (actions [n, A], updated prev_mean [N, H, A], key)."""
        n = obs.shape[0]
        keys = jax.random.split(key, n + 1)
        actions, means, _ = jax.vmap(
            partial(self._plan, eval_mode=eval_mode),
            in_axes=(None, 0, 0, 0, 0, None, None))(
            params, obs[:, None], prev_mean[:n], t0, keys[:n], task, prep)
        if n == prev_mean.shape[0]:
            prev_mean = means
        else:
            prev_mean = jax.lax.dynamic_update_slice_in_dim(
                prev_mean, means, 0, axis=0)
        return actions, prev_mean, keys[n]

    def act_tasks(self, obs, prev_mean, t0, tasks):
        """Greedy eval actions for a BATCH OF TASKS in one dispatch.

        Multi-task offline evaluation (reference evaluate.py:66-90 and
        offline_trainer.py:22-40) loops the 30/80 tasks sequentially — one
        dispatch per env step per task. Here the per-task episodes run in
        lockstep: the single-obs MPPI kernel is vmapped over (obs_i,
        prev_mean_i, t0_i, key_i, task_i), so each eval step costs one
        round trip for ALL tasks. `prev_mean` [n, H, A] is caller-owned
        (the eval loop threads it; n == num tasks, unrelated to
        cfg.num_envs). Returns (actions [n, A] numpy, new prev_mean).
        """
        obs = jnp.asarray(obs)
        n = obs.shape[0]
        t0v = np.broadcast_to(np.asarray(t0, bool).reshape(-1), (n,))
        tasks = jnp.asarray(tasks, jnp.int32).reshape(n, 1)
        if self._plan_tasks_jit is None:
            def plan_tasks(params, obs, pm, t0, key, tasks):
                m = obs.shape[0]   # trace-time constant (retrace per n)
                keys = jax.random.split(key, m + 1)
                # fused=False: the Pallas kernels' prepared weights are
                # task-dependent, so vmapping over the task axis would batch
                # the weights (unsupported); the XLA planner vmaps fine.
                a, means, _ = jax.vmap(
                    partial(self._plan, eval_mode=True, fused=False),
                    in_axes=(None, 0, 0, 0, 0, 0, None))(
                    params, obs[:, None], pm, t0, keys[:m], tasks, None)
                return a, means, keys[m]
            self._plan_tasks_jit = jax.jit(plan_tasks)
        st = self.state
        a, pm, key = self._plan_tasks_jit(
            st.params, obs, prev_mean, t0v, st.key, tasks)
        self.state = st.replace(key=key)
        return np.asarray(a), pm

    # ------------------------------------------------------------- planning

    def _cached_prep(self, task):
        """Agent-level cache of the fused-kernel weight prep: recomputed
        only when `self.state.params` is a NEW pytree (every update/load
        produces one — identity is the invalidation key, so direct state
        assignment invalidates too) or the task changes. Saves ~10 MB of
        cast/slice HBM traffic per plan for act/eval-heavy workloads."""
        if not (self._fused_rollout or self._fused_cem):
            return None
        tk = None if task is None else int(task)
        st_params = self.state.params
        if (self._prep_cache is None or self._prep_params is not st_params
                or self._prep_task != tk):
            t = None if tk is None else jnp.asarray([tk])
            self._prep_cache = self._prep_jit(st_params, t)
            self._prep_params = st_params
            self._prep_task = tk
        return self._prep_cache

    def _prepare_value(self, params, task):
        """Prepared (pre-sliced/cast, emb-and-mask-folded) weights for the
        fused value kernel; trace-time helper, call inside jit."""
        from tdmpc2_tpu.ops.pallas_rollout import prepare_value_params
        cfg = self.cfg
        dt = self._pallas_dot_dtype
        if cfg.multitask:
            return prepare_value_params(
                params, cfg, task=task,
                action_mask=self.model.action_masks[task][0], dot_dtype=dt)
        return prepare_value_params(params, cfg, dot_dtype=dt)

    def _estimate_value(self, params, z, actions, key, task, prep=None,
                        fused=True):
        """H-step latent return estimate (reference tdmpc2.py:122-136).

        z: [S, L]; actions: [H, S, A] -> value [S, 1].
        """
        cfg = self.cfg
        if self._fused_rollout and fused:
            # fully fused CEM value estimate: rollout + terminal pi + 2-of-N
            # Q decode (+ termination gate when episodic) in one VMEM-
            # resident kernel. The multitask task embedding and action mask
            # are folded into the prepared weights (bias folding), so the
            # kernel itself is task-oblivious. eps/qidx are generated here
            # with the exact key-split sequence of the XLA path below (pi's
            # normal sample, Q's head permutation) for RNG parity.
            from tdmpc2_tpu.ops.pallas_rollout import (prepare_value_params,
                                                       value_prepared)
            if prep is None:
                prep = self._prepare_value(params, task)
            k_pi, k_q = jax.random.split(key)
            eps = jax.random.normal(
                k_pi, (z.shape[0], cfg.action_dim), jnp.float32)
            if cfg.multitask:  # pi masks eps too (world_model.py:158-162)
                eps = eps * self.model.action_masks[task]
            qidx = jax.random.permutation(k_q, cfg.num_q)[:2]
            discount_f = jnp.asarray(self._task_discount(task), jnp.float32)
            discs = discount_f ** jnp.arange(cfg.horizon + 1)
            return value_prepared(
                prep, z, actions, eps, qidx, discs,
                horizon=cfg.horizon, episodic=cfg.episodic,
                log_std_min=self.model.log_std_min,
                log_std_dif=self.model.log_std_dif,
                dot_dtype=self._pallas_dot_dtype,
                interpret=self._cem_interpret)

        discount_f = jnp.asarray(self._task_discount(task), jnp.float32)

        def step(carry, a_t):
            z, G, disc, term = carry
            r = math.two_hot_inv(
                self.model.reward(params, z, a_t, task),
                cfg.num_bins, cfg.vmin, cfg.vmax)
            z = self.model.next(params, z, a_t, task)
            G = G + disc * (1.0 - term) * r
            disc = disc * discount_f
            if cfg.episodic:
                term = jnp.clip(
                    term + (self.model.termination(params, z, task) > 0.5
                            ).astype(term.dtype), max=1.0)
            return (z, G, disc, term), None

        G0 = jnp.zeros((z.shape[0], 1), z.dtype)
        term0 = jnp.zeros((z.shape[0], 1), z.dtype)
        disc0 = jnp.ones_like(discount_f)
        (z, G, disc, term), _ = jax.lax.scan(step, (z, G0, disc0, term0), actions)
        k_pi, k_q = jax.random.split(key)
        action, _ = self.model.pi(params, z, k_pi, task)
        q = self.model.Q(params, z, action, key=k_q, task=task, return_type='avg')
        return G + disc * (1.0 - term) * q

    def _plan(self, params, obs, prev_mean, t0, key, task, prep=None,
              *, eval_mode: bool, fused: bool = True):
        """MPPI planner as one fused kernel (reference tdmpc2.py:138-206).

        Returns (action [A], new_prev_mean [H, A], new_key).

        `prep` (optional) is the pre-cast/sliced fused-kernel weight tuple;
        `act()` passes the agent-level cached copy so the ~10 MB cast/slice
        runs once per parameter update, not once per plan.

        `fused=False` (static) forces the pure-XLA planner even when the
        Pallas kernels probed OK — required when `_plan` is vmapped over the
        TASK axis (act_tasks' lockstep multitask eval): the prepared weights
        are task-dependent, and the kernels reject batched weights.
        """
        cfg = self.cfg
        H, S, E = cfg.horizon, cfg.num_samples, cfg.num_elites
        n_pi = cfg.num_pi_trajs
        A = cfg.action_dim

        key, k_enc, k_pi_roll, k_loop, k_gumbel, k_noise, k_next = \
            jax.random.split(key, 7)
        enc_key = k_enc if cfg.obs == 'rgb' else None
        z0 = self.model.encode(params, obs, task, key=enc_key)  # [1, L]

        # Policy-prior trajectories (reference tdmpc2.py:154-160). With the
        # whole-CEM kernel, the rollouts run IN-kernel on the resident
        # dyn/pi weights; only the per-step sampling noise is drawn here
        # (same keys/shapes as model.pi would consume in the scan).
        use_cem = self._fused_cem and fused
        if n_pi > 0 and not use_cem:
            def pi_step(carry, k):
                z = carry
                a, _ = self.model.pi(params, z, k, task)
                return self.model.next(params, z, a, task), a
            zp = jnp.broadcast_to(z0, (n_pi, z0.shape[-1]))
            _, pi_actions = jax.lax.scan(
                pi_step, zp, jax.random.split(k_pi_roll, H))  # [H, n_pi, A]

        # fused-kernel weights: caller-provided (cached across plans) or
        # prepared here, outside the CEM loop (weights are loop-invariant)
        if prep is None:
            prep = (self._prepare_value(params, task)
                    if ((self._fused_rollout or self._fused_cem) and fused)
                    else None)

        z = jnp.broadcast_to(z0, (S, z0.shape[-1]))
        mean0 = jnp.where(
            t0,
            jnp.zeros((H, A), jnp.float32),
            jnp.concatenate([prev_mean[1:], jnp.zeros((1, A))], 0))
        std0 = jnp.full((H, A), cfg.max_std, jnp.float32)

        if cfg.multitask:
            a_mask = self.model.action_masks[task]  # [1, A]
        else:
            a_mask = None

        if use_cem:
            # Whole-CEM-loop Pallas kernel: all `self.iterations` iterations
            # (sample -> rollout -> elites -> moment update) in ONE program,
            # weights HBM->VMEM once per plan. Every random draw replicates
            # the fori_loop path's key-split sequence exactly, generated
            # here and passed as data (no in-kernel PRNG).
            from tdmpc2_tpu.ops.pallas_cem import cem_prepared
            noises, epss, qidxs = [], [], []
            k = k_loop
            for _ in range(self.iterations):
                k, k_r, k_v = jax.random.split(k, 3)
                r = jax.random.normal(k_r, (H, S - n_pi, A))
                k_pi_t, k_q_t = jax.random.split(k_v)
                eps_j = jax.random.normal(k_pi_t, (S, A), jnp.float32)
                if cfg.multitask:
                    eps_j = eps_j * a_mask
                qidxs.append(jax.random.permutation(k_q_t, cfg.num_q)[:2])
                r_pad = jnp.pad(r, ((0, 0), (n_pi, 0), (0, 0)))
                noises.append(jnp.moveaxis(r_pad, 0, 1).reshape(S, H * A))
                epss.append(eps_j)
            if n_pi > 0:
                pi_eps_steps = [
                    jax.random.normal(kh, (n_pi, A), jnp.float32)
                    for kh in jax.random.split(k_pi_roll, H)]
                if cfg.multitask:  # model.pi masks eps (world_model.py)
                    pi_eps_steps = [e * a_mask for e in pi_eps_steps]
                pi_eps = jnp.concatenate(pi_eps_steps, axis=-1)  # [n_pi,H*A]
            else:
                pi_eps = jnp.zeros((1, H * A), jnp.float32)
            discount_f = jnp.asarray(self._task_discount(task), jnp.float32)
            discs = discount_f ** jnp.arange(H + 1)
            amask_row = (a_mask if a_mask is not None
                         else jnp.ones((1, A), jnp.float32))
            mean_f, std_f, value, acts_flat = cem_prepared(
                prep, z0, pi_eps, jnp.stack(noises), jnp.stack(epss),
                jnp.stack(qidxs), discs, mean0.reshape(1, H * A),
                std0.reshape(1, H * A), amask_row,
                iterations=self.iterations, horizon=H, n_pi=n_pi,
                num_elites=E, temperature=cfg.temperature,
                min_std=cfg.min_std, max_std=cfg.max_std,
                episodic=cfg.episodic,
                log_std_min=self.model.log_std_min,
                log_std_dif=self.model.log_std_dif,
                dot_dtype=self._pallas_dot_dtype,
                interpret=self._cem_interpret)
            mean = mean_f.reshape(H, A)
            std = std_f.reshape(H, A)
            # final-iteration elites + Gumbel pick, identical to the XLA
            # loop's last-iteration computation (value is already NaN-clean)
            actions = jnp.moveaxis(acts_flat.reshape(S, H, A), 1, 0)
            elite_value, elite_idx = jax.lax.top_k(value[:, 0], E)
            elite_actions = actions[:, elite_idx]
            elite_value = elite_value[:, None]
            max_value = jnp.max(elite_value, axis=0)
            score = jnp.exp(cfg.temperature * (elite_value - max_value))
            score = score / jnp.sum(score, axis=0)
            idx = math.gumbel_softmax_sample(k_gumbel, score[:, 0])
            a = elite_actions[0, idx]
            if not eval_mode:
                a = a + std[0] * jax.random.normal(k_noise, (A,))
            return jnp.clip(a, -1, 1), mean, k_next

        def iteration(_, carry):
            mean, std, _, _, key = carry
            key, k_r, k_v = jax.random.split(key, 3)
            r = jax.random.normal(k_r, (H, S - n_pi, A))
            samples = jnp.clip(mean[:, None] + std[:, None] * r, -1, 1)
            if n_pi > 0:
                actions = jnp.concatenate([pi_actions, samples], axis=1)
            else:
                actions = samples
            if a_mask is not None:
                actions = actions * a_mask

            value = self._estimate_value(
                params, z, actions, k_v, task, prep, fused=fused)  # [S,1]
            value = jnp.nan_to_num(value, nan=0.0, posinf=0.0, neginf=0.0)
            elite_value, elite_idx = jax.lax.top_k(value[:, 0], E)
            elite_actions = actions[:, elite_idx]           # [H, E, A]
            elite_value = elite_value[:, None]              # [E, 1]

            max_value = jnp.max(elite_value, axis=0)
            score = jnp.exp(cfg.temperature * (elite_value - max_value))
            score = score / jnp.sum(score, axis=0)          # [E, 1]
            denom = jnp.sum(score, axis=0) + 1e-9
            mean = jnp.sum(score[None] * elite_actions, axis=1) / denom
            std = jnp.sqrt(
                jnp.sum(score[None] * (elite_actions - mean[:, None]) ** 2, axis=1)
                / denom)
            std = jnp.clip(std, cfg.min_std, cfg.max_std)
            if a_mask is not None:
                mean = mean * a_mask[0]
                std = std * a_mask[0]
            return mean, std, score, elite_actions, key

        carry0 = (mean0, std0,
                  jnp.full((E, 1), 1.0 / E, jnp.float32),
                  jnp.zeros((H, E, A), jnp.float32),
                  k_loop)
        mean, std, score, elite_actions, _ = jax.lax.fori_loop(
            0, self.iterations, iteration, carry0)

        # Gumbel-sample one elite trajectory (reference tdmpc2.py:199-204).
        idx = math.gumbel_softmax_sample(k_gumbel, score[:, 0])
        a = elite_actions[0, idx]
        if not eval_mode:
            a = a + std[0] * jax.random.normal(k_noise, (A,))
        return jnp.clip(a, -1, 1), mean, k_next

    # ------------------------------------------------------------- learning

    def update(self, buffer):
        """One model-learning iteration (reference tdmpc2.py:334-349)."""
        batch = buffer.sample()
        if self.mesh is not None:
            from tdmpc2_tpu import parallel
            batch = parallel.shard_batch(batch, self.mesh)
        self.state, info = self._update_jit(self.state, *batch)
        return info

    # HBM budget model for the auto update-chunk cap (VERDICT r4 #8):
    # usable v5e HBM when the tunneled backend hides memory_stats(), and the
    # reserve for everything that is not fused replay batches (planner
    # workspace, update activations, XLA scratch + fragmentation). The
    # reserve is CALIBRATED to the one measured geometry: walker-64px rgb
    # (12.3 GB ring, 151 MB batches) must resolve to the proven-safe chunk 8
    # (chunk 16 OOMed, commit 0134e2a).
    _HBM_FALLBACK_BYTES = 15_800_000_000
    _HBM_RESERVE_BYTES = 2_200_000_000

    def _auto_update_chunk(self, buffer) -> int:
        """Bytes-aware cap on updates fused per dispatch: each fused update
        materializes its replay batch in HBM, so the cap is
        free_bytes // batch_bytes. Free bytes come from memory_stats() when
        the backend reports it; on the tunneled chip (it does not) from the
        v5e budget minus the device ring and the train-state pytree
        (params + target + Adam moments — 5 GB at 317M). Returns 0 when
        batch bytes are unknown (no cap)."""
        resolve = getattr(buffer, 'sample_batch_bytes', None)
        bb = resolve() if resolve is not None else None
        if not bb:
            return 0
        free = _device_free_bytes()
        if free is None:
            state_bytes = sum(getattr(l, 'nbytes', 0)
                              for l in jax.tree.leaves(self.state))
            free = (self._HBM_FALLBACK_BYTES - buffer.device_ring_bytes()
                    - state_bytes)
        return max(1, int((free - self._HBM_RESERVE_BYTES) // bb))

    def _update_chunk(self, buffer) -> int:
        """cfg.update_chunk > 0 is an explicit override; 0 means auto
        (bytes-aware; 0 = uncapped when geometry is unknown). Auto is cached
        per buffer storage: geometry is fixed once storage is allocated."""
        chunk = self.cfg.get('update_chunk', 0)
        if chunk:
            return chunk
        storage = getattr(buffer, '_storage', None)
        if storage is None:
            return 0
        cached = getattr(self, '_auto_chunk_cache', None)
        if cached is None or cached[0] is not storage:
            cached = (storage, self._auto_update_chunk(buffer))
            self._auto_chunk_cache = cached
        return cached[1]

    def update_many(self, buffer, n: int):
        """`n` sequential learning iterations fused into one device call:
        one batched replay gather + a `lax.scan` over the update step. On the
        same n pre-drawn batches the scan is numerically identical to n
        sequential `update()` calls (tested: tests/test_agent.py); the draw
        stream differs from n separate `sample()` calls because all n batches
        come from one `sample_many` draw. Amortizes per-dispatch overhead for
        batched collection and offline training; no reference counterpart.

        The update-chunk cap (explicit cfg.update_chunk, else the bytes-aware
        auto cap — see `_auto_update_chunk`) bounds the updates fused per
        dispatch; larger n runs as ceil(n/chunk) sequential dispatches."""
        chunk = self._update_chunk(buffer)
        if chunk and n > chunk:
            info = None
            for m in range(0, n, chunk):
                info = self.update_many(buffer, min(chunk, n - m))
            return info
        if n == 1:
            return self.update(buffer)
        batch = buffer.sample_many(n)
        if self.mesh is not None:
            from tdmpc2_tpu import parallel
            batch = parallel.shard_batch(batch, self.mesh, batch_axis=2)
        self.state, info = self._update_scan_jit(self.state, *batch)
        return info

    def vec_step(self, buffer, obs, t0, n_updates: int):
        """Fused actor-learner step: plan for all envs + draw `n_updates`
        replay batches + run the `n_updates`-step update scan, all inside ONE
        jitted dispatch.

        The tunneled single-chip online loop is dispatch-latency-bound
        (docs/PERFORMANCE.md): the unfused loop pays ~4 round trips per
        vector step (weight-prep, plan, replay sample, update scan); this
        pays one dispatch plus the unavoidable action fetch. Actions are
        planned with the PRE-update parameters and the replay draw stream is
        `sample_many`'s — the composition is numerically identical to
        `act(...)` followed by `update_many(...)` (tested:
        tests/test_fused_step.py). No reference counterpart (the reference
        interleaves plan/update as separate CUDA-graph replays,
        tdmpc2/tdmpc2.py:114, 334-349).

        Falls back to the separate act/update path when the buffer lives in
        host RAM (its gather is numpy) or for multitask/pi-only configs.
        Returns (actions [n, A] numpy, update metrics).
        """
        cfg = self.cfg
        if (not cfg.mpc or cfg.multitask or self.mesh is not None
                or not getattr(buffer, '_on_device', False)):
            a = self.act(obs, t0=t0)
            return a, self.update_many(buffer, n_updates)
        assert buffer._num_eps > 0, 'Cannot step from an empty buffer'
        obs_j = jnp.asarray(obs)
        n_envs = obs_j.shape[0]
        t0v = np.broadcast_to(np.asarray(t0, bool).reshape(-1), (n_envs,))
        if self._megastep_jit is None or self._megastep_buffer is not buffer:
            self._megastep_buffer = buffer

            def megastep(state, storage, ep_rows, n_filled, draw, obs, t0,
                         *, n_batches):
                prep = (self._prepare_value(state.params, None)
                        if (self._fused_rollout or self._fused_cem) else None)
                a, prev_mean, key = self._plan_vec(
                    state.params, obs, state.prev_mean, t0, state.key,
                    None, prep, eval_mode=False)
                state = state.replace(prev_mean=prev_mean, key=key)
                batch = buffer._sample_device(
                    storage, ep_rows, None, n_filled, draw,
                    n_batches=n_batches)
                if n_batches == 1:   # scan expects a leading n axis
                    batch = tuple(None if b is None else b[None]
                                  for b in batch)
                state, info = self._update_scan(state, *batch[:4])
                return state, a, info

            self._megastep_jit = jax.jit(
                megastep, donate_argnums=0, static_argnames=('n_batches',))
        buffer._draws += 1
        n_filled = np.int32(min(buffer._num_eps, buffer._capacity_eps))
        names = sorted(buffer._storage)
        self.state, a, info = self._megastep_jit(
            self.state, {k: buffer._storage[k] for k in names},
            buffer._ep_rows, n_filled, np.int32(buffer._draws),
            obs_j, t0v, n_batches=n_updates)
        return np.asarray(a), info

    def act_collect(self, obs, t0):
        """Training-time batched act: like `act(...)` but with the fused-
        kernel weight prep computed INSIDE the jit — during collection the
        params change every step, so the act()-level prep cache never hits
        and would cost a separate dispatch per step. Single-task mpc only
        (the collection trainers' domain); falls back to act() otherwise."""
        cfg = self.cfg
        if not cfg.mpc or cfg.multitask or not (
                self._fused_rollout or self._fused_cem):
            return self.act(obs, t0=t0)
        obs_j = jnp.asarray(obs)
        n = obs_j.shape[0]
        t0v = np.broadcast_to(np.asarray(t0, bool).reshape(-1), (n,))
        if self._plan_collect_jit is None:
            def plan_collect(params, obs, pm, t0, key):
                prep = self._prepare_value(params, None)
                return self._plan_vec(params, obs, pm, t0, key, None, prep,
                                      eval_mode=False)
            self._plan_collect_jit = jax.jit(plan_collect)
        st = self.state
        a, prev_mean, key = self._plan_collect_jit(
            st.params, obs_j, st.prev_mean, t0v, st.key)
        self.state = st.replace(prev_mean=prev_mean, key=key)
        return np.asarray(a)

    def update_many_fused(self, buffer, n: int):
        """`n` updates with the replay draw INSIDE the jit — one dispatch
        (vs `sample_many` + update scan = 2). The draw stream and numerics
        are exactly `update_many`'s (tested: tests/test_fused_step.py).
        Used by the pipelined collection schedule: the trainer dispatches
        this asynchronously right after the action fetch, so the update
        executes on device while the host steps physics.

        The update-chunk cap (explicit or bytes-aware auto) bounds the fused
        scan length exactly as in `update_many` (the in-jit draw also
        materializes all n batches)."""
        chunk = self._update_chunk(buffer)
        if chunk and n > chunk:
            info = None
            for m in range(0, n, chunk):
                info = self.update_many_fused(buffer, min(chunk, n - m))
            return info
        if (self.cfg.multitask or self.mesh is not None
                or not getattr(buffer, '_on_device', False)):
            return self.update_many(buffer, n)
        assert buffer._num_eps > 0, 'Cannot update from an empty buffer'
        if self._upd_fused_jit is None or self._upd_fused_buffer is not buffer:
            self._upd_fused_buffer = buffer

            def upd(state, storage, ep_rows, n_filled, draw, *, n_batches):
                batch = buffer._sample_device(
                    storage, ep_rows, None, n_filled, draw,
                    n_batches=n_batches)
                if n_batches == 1:   # scan expects a leading n axis
                    batch = tuple(None if b is None else b[None]
                                  for b in batch)
                return self._update_scan(state, *batch[:4])

            self._upd_fused_jit = jax.jit(
                upd, donate_argnums=0, static_argnames=('n_batches',))
        buffer._draws += 1
        names = sorted(buffer._storage)
        self.state, info = self._upd_fused_jit(
            self.state, {k: buffer._storage[k] for k in names},
            buffer._ep_rows,
            np.int32(min(buffer._num_eps, buffer._capacity_eps)),
            np.int32(buffer._draws), n_batches=n)
        return info

    def _update_scan(self, state, obs, action, reward, terminated, task=None):
        xs = (obs, action, reward, terminated)
        if task is None:
            def body(st, b):
                return self._update(st, *b)
            state, infos = jax.lax.scan(body, state, xs)
        else:
            def body(st, b):
                *main, t = b
                return self._update(st, *main, task=t)
            state, infos = jax.lax.scan(body, state, xs + (task,))
        return state, jax.tree.map(lambda x: x[-1], infos)

    def _td_target(self, params, target_Qs, next_z, reward, terminated, task, key):
        """Min-Q TD target under stop-gradient (reference tdmpc2.py:241-257)."""
        k_pi, k_q = jax.random.split(key)
        action, _ = self.model_upd.pi(params, next_z, k_pi, task)
        if self.cfg.multitask:
            discount = self.discount[task][..., None]
        else:
            discount = self.discount
        q = self.model_upd.Q(params, next_z, action, key=k_q, task=task,
                         return_type='min', target_params=target_Qs)
        return reward + discount * (1.0 - terminated) * q

    def _update(self, state: TrainState, obs, action, reward, terminated, task=None):
        """The fused training step (reference tdmpc2.py:259-332)."""
        cfg = self.cfg
        T = cfg.horizon
        rho_t = jnp.power(cfg.rho, jnp.arange(T, dtype=jnp.float32))

        key = state.key
        (key, k_enc_next, k_td, k_enc0, k_drop, k_pi_upd, k_pi_q,
         k_pi_drop, k_next) = jax.random.split(key, 9)

        # -- targets (no grad) -- reference tdmpc2.py:261-263
        enc_key = k_enc_next if cfg.obs == 'rgb' else None
        next_z = jax.lax.stop_gradient(
            self.model_upd.encode(state.params, obs[1:], task, key=enc_key))
        td_targets = jax.lax.stop_gradient(
            self._td_target(state.params, state.target_Qs, next_z,
                            reward, terminated, task, k_td))

        # -- model loss -- reference tdmpc2.py:268-304
        def loss_fn(params):
            enc0_key = k_enc0 if cfg.obs == 'rgb' else None
            z0 = self.model_upd.encode(params, obs[0], task, key=enc0_key)

            def rollout(z, a_t):
                z_next = self.model_upd.next(params, z, a_t, task)
                return z_next, z_next

            _, zs_pred = jax.lax.scan(rollout, z0, action)   # [T, B, L]
            consistency = jnp.sum(
                jnp.mean((zs_pred - next_z) ** 2, axis=(1, 2)) * rho_t)
            zs = jnp.concatenate([z0[None], zs_pred], axis=0)  # [T+1, B, L]

            _zs = zs[:-1]
            qs = self.model_upd.Q(params, _zs, action, task=task,
                              return_type='all', dropout_key=k_drop)
            reward_preds = self.model_upd.reward(params, _zs, action, task)

            reward_loss = jnp.sum(jnp.mean(
                math.soft_ce(reward_preds, reward,
                             cfg.num_bins, cfg.vmin, cfg.vmax),
                axis=(1, 2)) * rho_t)
            value_loss = jnp.sum(jnp.mean(
                math.soft_ce(qs, td_targets[None],
                             cfg.num_bins, cfg.vmin, cfg.vmax),
                axis=(2, 3)) * rho_t[None])  # summed over (q, t)

            consistency = consistency / T
            reward_loss = reward_loss / T
            value_loss = value_loss / (T * cfg.num_q)
            if cfg.episodic:
                term_logit = self.model_upd.termination(
                    params, zs[1:], task, unnormalized=True)
                termination_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
                    term_logit, terminated))
            else:
                term_logit = None
                termination_loss = 0.0
            total = (cfg.consistency_coef * consistency
                     + cfg.reward_coef * reward_loss
                     + cfg.termination_coef * termination_loss
                     + cfg.value_coef * value_loss)
            aux = dict(zs=zs, consistency_loss=consistency,
                       reward_loss=reward_loss, value_loss=value_loss,
                       termination_loss=termination_loss, term_logit=term_logit)
            return total, aux

        (total_loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = self._model_tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # -- policy update -- reference tdmpc2.py:208-239, 313
        zs = jax.lax.stop_gradient(aux['zs'])
        rho_pi = jnp.power(cfg.rho, jnp.arange(T + 1, dtype=jnp.float32))

        def pi_loss_fn(pi_params):
            p = dict(new_params, pi=pi_params)
            a_pi, info = self.model_upd.pi(p, zs, k_pi_upd, task)
            qs_pi = self.model_upd.Q(p, zs, a_pi, key=k_pi_q, task=task,
                                 return_type='avg', detach=True,
                                 dropout_key=k_pi_drop)
            # running-scale update on the t=0 slice (reference scale.py:39-42,
            # tdmpc2.py:221-222); the scale itself is not differentiated.
            new_scale = scale_ops.update_scale(state.scale, qs_pi[0], cfg.tau)
            qs_scaled = qs_pi / new_scale
            pi_loss = jnp.mean(
                -jnp.mean(cfg.entropy_coef * info['scaled_entropy'] + qs_scaled,
                          axis=(1, 2)) * rho_pi)
            return pi_loss, (new_scale, info)

        (pi_loss, (new_scale, pi_info)), pi_grads = jax.value_and_grad(
            pi_loss_fn, has_aux=True)(new_params['pi'])
        pi_grad_norm = optax.global_norm(pi_grads)
        pi_updates, new_pi_opt_state = self._pi_tx.update(
            pi_grads, state.pi_opt_state, new_params['pi'])
        new_params = dict(new_params, pi=optax.apply_updates(
            new_params['pi'], pi_updates))

        # -- Polyak target update -- reference tdmpc2.py:316, world_model.py:82-86
        new_target_Qs = optax.incremental_update(
            new_params['Qs'], state.target_Qs, cfg.tau)

        info = {
            'consistency_loss': aux['consistency_loss'],
            'reward_loss': aux['reward_loss'],
            'value_loss': aux['value_loss'],
            'termination_loss': aux['termination_loss'],
            'total_loss': total_loss,
            'grad_norm': grad_norm,
            'pi_loss': pi_loss,
            'pi_grad_norm': pi_grad_norm,
            'pi_entropy': jnp.mean(pi_info['entropy']),
            'pi_scaled_entropy': jnp.mean(pi_info['scaled_entropy']),
            'pi_scale': new_scale,
        }
        if cfg.episodic:
            info.update(math.termination_statistics(
                jax.nn.sigmoid(aux['term_logit'][-1]), terminated[-1]))

        new_state = state.replace(
            params=new_params,
            target_Qs=new_target_Qs,
            opt_state=new_opt_state,
            pi_opt_state=new_pi_opt_state,
            scale=new_scale,
            key=k_next,
        )
        return new_state, info
