"""Pallas TPU kernel: the ENTIRE MPPI/CEM planning loop as one program.

The per-iteration fused value kernel (ops/pallas_rollout.py) still re-streams
every MLP's weights from HBM once per CEM iteration: ~10 MB of bf16 weights x
`iterations` (6) loads ≈ 70 us of pure HBM traffic per plan — the dominant
cost of the planner (reference loop: tdmpc2/tdmpc2.py:162-198). This kernel
keeps the weights resident in VMEM across ALL iterations and runs the whole
CEM loop — sample -> H-step latent rollout -> terminal policy + 2-of-N Q
bootstrap -> elite selection -> moment update — in a single grid program per
environment, so the weights are loaded exactly once per plan.

TPU-native formulation choices (beyond ops/pallas_rollout.py's):
- Lane-packed operands: per-(iteration, step) noise and the policy-prior
  trajectories are passed as [S, H*A] flats (static lane slices in-kernel)
  instead of [H, S, A] — A=6 would waste 95% of each 128-lane tile and
  overflow the ~16 MB VMEM together with the resident weights.
- Elite selection WITHOUT top-k gather: the kernel needs only the E-th
  largest value, found by 32-step scalar bisection on [lo, hi] invariants
  (cnt(v>=lo) >= E > cnt(v>=hi)). Elite weights are then a compare mask,
  with the (E - cnt_above) residual shared across the boundary shell —
  exactly top-k when values are distinct (the generic case), and a uniform
  E/S weighting when all values tie (e.g. the zero-init first plan), which
  matches XLA top-k's arbitrary-subset average in expectation. The softmax
  moment update then needs no gather at all: score-weighted sums over the
  sample axis (reference tdmpc2.py:186-196).
- Per-env scalar operands (Q-head subsample, discount row) ride in
  full-array SMEM indexed by program_id — the batched-acting lowering rule
  (see value_prepared's custom_vmap note in ops/pallas_rollout.py).

RNG parity: every random draw (per-iteration sample noise, terminal-policy
eps, Q-head choice) is generated OUTSIDE with the exact key-split sequence
of the XLA planner loop and passed in as data, so kernel-vs-XLA plans agree
to float tolerance. The final Gumbel elite pick stays outside (it needs one
[S] top-k once per plan, not per iteration).

Inference-only; falls back to interpret mode off-TPU for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdmpc2_tpu.ops.pallas_rollout import _ln, _mish

_F32_HUGE = 3.0e38  # finite-value guard (nan_to_num semantics)


def _cem_kernel(
    z0_ref, pieps_ref, noise_ref, eps_ref, mean0_ref, std0_ref, amask_ref,
    qidx_ref, discs_ref, *refs,
    iterations: int, horizon: int, n_pi: int, num_elites: int,
    temperature: float, min_std: float, max_std: float, episodic: bool,
    dot_dtype, log_std_min: float, log_std_dif: float,
):
    f32 = jnp.float32
    env = pl.program_id(0)
    mean_ref, std_ref, v_ref, acts_ref = refs[-4:]
    it_w = iter(refs[:-4])

    def take(n):
        return [next(it_w) for _ in range(n)]

    (dWz, dWa, db0, dg0, de0, dW1, db1, dg1, de1,
     dW2, db2, dg2, de2) = take(13)
    (rWz, rWa, rb0, rg0, re0, rW1, rb1, rg1, re1, rW2, rb2) = take(11)
    if episodic:
        (tW0, tb0, tg0, te0, tW1, tb1, tg1, te1, tW2, tb2) = take(10)
    (pW0, pb0, pg0, pe0, pW1, pb1, pg1, pe1,
     pWm, pbm, pWl, pbl) = take(12)
    (qWz, qWa, qb0, qg0, qe0, qW1, qb1, qg1, qe1, qW2, qb2) = take(11)
    bins, gmask = take(2)

    H, A = horizon, amask_ref.shape[-1]
    S = noise_ref.shape[2]
    E = float(num_elites)

    def dot(x, w):
        return jnp.dot(x.astype(dot_dtype), w, preferred_element_type=f32)

    def two_hot_dec(logits):
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        x = (jnp.sum(e * bins[:], axis=-1, keepdims=True)
             / jnp.sum(e, axis=-1, keepdims=True))
        return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)

    z0 = z0_ref[0]                                    # [1, L]
    amask = amask_ref[0]                              # [1, A]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    is_pi = (row < n_pi).astype(f32)

    def pi_head(zz):
        """Policy prior forward: (mean, log_std); the multitask action mask
        and task embedding are folded into the prepared weights."""
        u = dot(zz, pW0[:]) + pb0[:]
        u = _mish(_ln(u, pg0[:], pe0[:]))
        u = dot(u, pW1[:]) + pb1[:]
        u = _mish(_ln(u, pg1[:], pe1[:]))
        pm = dot(u, pWm[:]) + pbm[:]
        ls = dot(u, pWl[:]) + pbl[:]
        return pm, log_std_min + 0.5 * log_std_dif * (jnp.tanh(ls) + 1.0)

    def dyn_step(zz, aa):
        v = dot(zz, dWz[:]) + dot(aa, dWa[:]) + db0[:]
        v = _mish(_ln(v, dg0[:], de0[:]))
        v = dot(v, dW1[:]) + db1[:]
        v = _mish(_ln(v, dg1[:], de1[:]))
        v = dot(v, dW2[:]) + db2[:]
        v = _ln(v, dg2[:], de2[:])
        mv = jnp.max(v, axis=-1, keepdims=True)
        ev = jnp.exp(v - mv)
        return ev / dot(ev, gmask[:])

    # -- policy-prior trajectories, rolled out in-kernel (the reference's
    #    24 pi rollouts, tdmpc2.py:154-160): same resident dyn/pi weights,
    #    eps pre-generated outside with the XLA path's key sequence
    pi_rows = []                                      # H x [S, A], pi rows
    if n_pi > 0:
        pieps = pieps_ref[0]                          # [n_pi, H*A]
        zp = z0 + jnp.zeros((n_pi, z0.shape[-1]), f32)
        pad = jnp.zeros((S - n_pi, A), f32)
        for t in range(H):
            pm, ls = pi_head(zp)
            a_p = jnp.tanh(pm + pieps[:, t * A:(t + 1) * A] * jnp.exp(ls))
            pi_rows.append(jnp.concatenate([a_p, pad], axis=0))
            zp = dyn_step(zp, a_p)

    mean = mean0_ref[0]                               # [1, H*A]
    std = std0_ref[0]

    for it in range(iterations):
        # -- sample actions: clip(mean + std * noise), policy-prior rows
        #    overridden, multitask action mask applied (ones if single-task)
        acts = []
        for t in range(H):
            sl = slice(t * A, (t + 1) * A)
            nz = noise_ref[0, it, :, sl]              # [S, A]
            samp = jnp.clip(mean[:, sl] + std[:, sl] * nz, -1.0, 1.0)
            if n_pi > 0:
                a_t = is_pi * pi_rows[t] + (1.0 - is_pi) * samp
            else:
                a_t = samp
            acts.append(a_t * amask)

        # -- H-step latent rollout (reward + dynamics [+ termination])
        z = z0 + jnp.zeros((S, z0.shape[-1]), f32)
        G = jnp.zeros((S, 128), f32)
        term = jnp.zeros((S, 1), f32)
        for t in range(H):
            a = acts[t]
            u = dot(z, rWz[:]) + dot(a, rWa[:]) + rb0[:]
            u = _mish(_ln(u, rg0[:], re0[:]))
            u = dot(u, rW1[:]) + rb1[:]
            u = _mish(_ln(u, rg1[:], re1[:]))
            r = two_hot_dec(dot(u, rW2[:]) + rb2[:])
            if episodic:
                r = (1.0 - term) * r
            G = G + discs_ref[env, t] * r

            z = dyn_step(z, a)

            if episodic:
                w = dot(z, tW0[:]) + tb0[:]
                w = _mish(_ln(w, tg0[:], te0[:]))
                w = dot(w, tW1[:]) + tb1[:]
                w = _mish(_ln(w, tg1[:], te1[:]))
                logit = dot(w, tW2[:]) + tb2[:]
                term = jnp.minimum(term + (logit > 0.0).astype(f32), 1.0)

        # -- terminal policy prior + 2-of-num_q Q bootstrap ('avg' decode)
        pmean, lstd = pi_head(z)
        a_term = jnp.tanh(pmean + eps_ref[0, it] * jnp.exp(lstd))

        q_acc = jnp.zeros((S, 1), f32)
        for j in range(2):
            # qidx rides as a rank-2 [N, I*2] SMEM array (rank-2 scalar
            # operands are the safest Mosaic SMEM layout)
            i = qidx_ref[env, 2 * it + j]
            u = dot(z, qWz[i]) + dot(a_term, qWa[i]) + qb0[pl.ds(i, 1), :]
            u = _mish(_ln(u, qg0[pl.ds(i, 1), :], qe0[pl.ds(i, 1), :]))
            u = dot(u, qW1[i]) + qb1[pl.ds(i, 1), :]
            u = _mish(_ln(u, qg1[pl.ds(i, 1), :], qe1[pl.ds(i, 1), :]))
            q_acc = q_acc + two_hot_dec(dot(u, qW2[i]) + qb2[pl.ds(i, 1), :])
        q = q_acc / 2.0
        if episodic:
            q = (1.0 - term) * q

        v = (G[:, :1] + discs_ref[env, horizon] * q)  # [S, 1]
        v = jnp.where((v == v) & (jnp.abs(v) <= _F32_HUGE), v, 0.0)

        # -- E-th-largest by scalar bisection; elite weights from the mask
        vmax = jnp.max(v)
        lo0 = jnp.min(v)
        hi0 = vmax + 0.001 * jnp.abs(vmax) + 1.0

        def bisect(_, lh):
            lo, hi = lh
            # lo + 0.5*(hi-lo), NOT 0.5*(lo+hi): values clamped at the
            # _F32_HUGE guard would overflow lo+hi to inf and stall hi
            mid = lo + 0.5 * (hi - lo)
            cnt = jnp.sum((v >= mid).astype(f32))
            return jnp.where(cnt >= E, mid, lo), jnp.where(cnt >= E, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 32, bisect, (lo0, hi0))
        n1 = jnp.sum((v >= hi).astype(f32))
        nb = jnp.sum((v >= lo).astype(f32)) - n1
        wb = (E - n1) / jnp.maximum(nb, 1.0)
        w = jnp.where(v >= hi, 1.0, jnp.where(v >= lo, wb, 0.0))

        score = jnp.exp(temperature * (v - vmax)) * w
        score = score / jnp.sum(score)
        denom = jnp.sum(score) + 1e-9

        # -- softmax-weighted moment update (reference tdmpc2.py:186-196)
        new_mean, new_std = [], []
        for t in range(H):
            a_t = acts[t]
            m_t = jnp.sum(score * a_t, axis=0, keepdims=True) / denom
            s_t = jnp.sqrt(
                jnp.sum(score * (a_t - m_t) ** 2, axis=0, keepdims=True)
                / denom)
            new_mean.append(m_t)
            new_std.append(jnp.clip(s_t, min_std, max_std))
        mean = jnp.concatenate(new_mean, axis=-1) * amask_flat(amask, H)
        std = jnp.concatenate(new_std, axis=-1) * amask_flat(amask, H)

        if it == iterations - 1:
            v_ref[0] = v + jnp.zeros((S, 128), f32)   # lane-broadcast
            # one aligned full-row store (per-t lane slices of width A would
            # be unaligned stores, the least-supported Mosaic store form)
            acts_ref[0] = jnp.concatenate(acts, axis=-1)

    mean_ref[0] = mean
    std_ref[0] = std


def amask_flat(amask, horizon):
    """[1, A] action mask tiled to the [1, H*A] flat layout."""
    return jnp.concatenate([amask] * horizon, axis=-1)


def cem_prepared(prep, z0, pi_eps, noise_flat, eps, qidx, discs, mean0,
                 std0, amask, *, iterations: int, horizon: int, n_pi: int,
                 num_elites: int, temperature: float, min_std: float,
                 max_std: float, episodic: bool, log_std_min: float,
                 log_std_dif: float, dot_dtype=jnp.bfloat16,
                 interpret: bool = False):
    """Whole-CEM-loop plan for one env (vmap-safe for batched acting).

    z0 [1, L]; pi_eps [max(n_pi,1), H*A] (policy-prior sampling noise — the
    pi rollouts themselves run in-kernel on the resident dyn/pi weights);
    noise_flat [I, S, H*A]; eps [I, S, A]; qidx [I, 2] i32; discs [H+1];
    mean0/std0 [1, H*A]; amask [1, A] (ones if single-task).
    Returns (mean [H*A], std [H*A], v [S, 1], acts_flat [S, H*A]).

    Batched acting vmaps this over the env axis: the custom_vmap rule below
    maps envs to grid programs (one program = one env's full CEM loop) with
    per-env qidx/discs as full-array SMEM — vmap-tiling the call directly
    does not lower (same Mosaic SMEM-block rule as value_prepared).
    """
    prep = tuple(prep)
    kw = dict(iterations=iterations, horizon=horizon, n_pi=n_pi,
              num_elites=num_elites, temperature=temperature,
              min_std=min_std, max_std=max_std, episodic=episodic,
              log_std_min=log_std_min, log_std_dif=log_std_dif,
              dot_dtype=dot_dtype, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def call(z0, pi_eps, noise_flat, eps, qidx, discs, mean0, std0, amask,
             prep):
        out = _cem_flat(prep, z0[None], pi_eps[None], noise_flat[None],
                        eps[None], qidx[None], discs[None], mean0[None],
                        std0[None], amask, **kw)
        return jax.tree.map(lambda x: x[0], out)

    @call.def_vmap
    def _batched(axis_size, in_batched, z0, pi_eps, noise_flat, eps, qidx,
                 discs, mean0, std0, amask, prep):
        (zb, pb, nb, eb, qb, db, mb, sb, ab, wb) = in_batched
        assert not any(jax.tree.leaves(wb)), (
            'fused CEM kernel: vmap over prepared weights is unsupported')
        assert not ab, 'per-env action masks are unsupported (shared task)'
        N = axis_size

        def bat(x, batched):
            return x if batched else jnp.broadcast_to(x, (N,) + x.shape)

        out = _cem_flat(
            prep, bat(z0, zb), bat(pi_eps, pb), bat(noise_flat, nb),
            bat(eps, eb), bat(qidx, qb), bat(discs, db), bat(mean0, mb),
            bat(std0, sb), amask, **kw)
        return out, (True, True, True, True)

    return call(z0, pi_eps, noise_flat, eps, qidx, discs, mean0, std0,
                amask, prep)


def _cem_flat(prep, z0, pi_eps, noise_flat, eps, qidx, discs, mean0, std0,
              amask, *, iterations, horizon, n_pi, num_elites, temperature,
              min_std, max_std, episodic, log_std_min, log_std_dif,
              dot_dtype, interpret):
    """N-env kernel launch: one grid program per env, weights const."""
    N, _, L = z0.shape
    S, HA = noise_flat.shape[2:]
    A = amask.shape[-1]
    I = iterations
    kernel = functools.partial(
        _cem_kernel, iterations=I, horizon=horizon, n_pi=n_pi,
        num_elites=num_elites, temperature=float(temperature),
        min_std=float(min_std), max_std=float(max_std),
        episodic=bool(episodic), dot_dtype=dot_dtype,
        log_std_min=float(log_std_min), log_std_dif=float(log_std_dif))

    def const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def env_spec(x):
        nd = x.ndim
        return pl.BlockSpec((1,) + x.shape[1:],
                            lambda i, _nd=nd: (i,) + (0,) * (_nd - 1),
                            memory_space=pltpu.VMEM)

    def smem_full(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM)

    # [N, I, 2] -> [N, I*2]: rank-2 SMEM scalar operands lower most reliably
    qidx = qidx.astype(jnp.int32).reshape(N, I * 2)
    discs = discs.astype(jnp.float32)
    in_specs = ([env_spec(z0), env_spec(pi_eps), env_spec(noise_flat),
                 env_spec(eps), env_spec(mean0), env_spec(std0),
                 const_spec(amask), smem_full(qidx), smem_full(discs)]
                + [const_spec(p) for p in prep])

    mean, std, v, acts = pl.pallas_call(
        kernel,
        grid=(N,),
        out_shape=(jax.ShapeDtypeStruct((N, 1, HA), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1, HA), jnp.float32),
                   jax.ShapeDtypeStruct((N, S, 128), jnp.float32),
                   jax.ShapeDtypeStruct((N, S, HA), jnp.float32)),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1,) + tail, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for tail in ((1, HA), (1, HA), (S, 128), (S, HA))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z0, pi_eps, noise_flat, eps, mean0, std0, amask, qidx, discs, *prep)
    return mean[:, 0], std[:, 0], v[:, :, :1], acts


def probe_cem_kernel(params, cfg, log_std_min, log_std_dif,
                     iterations: int) -> bool:
    """Compile + run the whole-CEM kernel once at production geometry (the
    VMEM-resident footprint depends on the real model dims, so a tiny-shape
    probe would not predict compile success). Also probes the batched
    (num_envs>1) lowering. Any failure returns False -> per-iteration
    fused value kernel (or XLA) fallback.

    On TPU the probe first runs in a killable CHILD process (timeout 120 s,
    see pallas_rollout.probe_in_subprocess): a wedged Mosaic engine can hang
    the kernel COMPILE itself, which no in-process mechanism can interrupt."""
    import numpy as np
    from tdmpc2_tpu.ops.pallas_rollout import (mosaic_engine_alive,
                                               probe_in_subprocess)
    if not mosaic_engine_alive():
        return False
    if not probe_in_subprocess(
            'cem', (params, cfg, log_std_min, log_std_dif, iterations),
            timeout=120.0):
        return False
    try:
        from tdmpc2_tpu.ops.pallas_rollout import prepare_value_params
        task = 0 if cfg.multitask else None
        mask = None
        if cfg.multitask and task is not None:
            mask = jnp.ones((cfg.action_dim,), jnp.float32)
        prep = prepare_value_params(params, cfg, task=task, action_mask=mask)
        S, L, A, H, I = (cfg.num_samples, cfg.latent_dim, cfg.action_dim,
                        cfg.horizon, iterations)
        args = dict(
            z0=jnp.full((1, L), 1.0 / L, jnp.float32),
            pi_eps=jnp.zeros((max(cfg.num_pi_trajs, 1), H * A),
                             jnp.float32),
            noise_flat=jnp.zeros((I, S, H * A), jnp.float32),
            eps=jnp.zeros((I, S, A), jnp.float32),
            qidx=jnp.tile(jnp.arange(2, dtype=jnp.int32), (I, 1)),
            discs=jnp.full((H + 1,), 0.99, jnp.float32),
            mean0=jnp.zeros((1, H * A), jnp.float32),
            std0=jnp.full((1, H * A), 0.5, jnp.float32),
        )
        kw = dict(iterations=I, horizon=H, n_pi=cfg.num_pi_trajs,
                  num_elites=cfg.num_elites, temperature=cfg.temperature,
                  min_std=cfg.min_std, max_std=cfg.max_std,
                  episodic=cfg.episodic, log_std_min=float(log_std_min),
                  log_std_dif=float(log_std_dif))
        amask = jnp.ones((1, A), jnp.float32)
        m, s, v, a = cem_prepared(prep, amask=amask, **args, **kw)
        ok = all(bool(np.isfinite(np.asarray(x)).all()) for x in (m, s, v, a))
        n = 2
        bat = jax.vmap(
            lambda z, pf, nf, e, qi: cem_prepared(
                prep, z, pf, nf, e, qi, args['discs'], args['mean0'],
                args['std0'], amask, **kw))(
            *(jnp.broadcast_to(args[k], (n,) + args[k].shape)
              for k in ('z0', 'pi_eps', 'noise_flat', 'eps', 'qidx')))
        okb = all(bool(np.isfinite(np.asarray(x)).all()) for x in bat)
        return ok and okb
    except Exception as e:  # noqa: BLE001 — any failure means "fall back"
        print(f'[tdmpc2-tpu] whole-CEM kernel probe failed '
              f'({type(e).__name__}: {e}); falling back', flush=True)
        return False
