"""Pallas TPU kernel: fused MPPI value-estimation rollout.

The planner's hot inner loop (reference: tdmpc2/tdmpc2.py:122-136, compiled
as scan-of-matmuls in `TDMPC2._estimate_value`) evaluates, for every one of
S sampled action sequences and each of H horizon steps, a reward MLP and a
dynamics MLP over the latent. Under XLA each matmul streams its weights from
HBM every step, so the rollout is weight-bandwidth-bound: ~8 MB of MLP
weights re-read H times per CEM iteration. This kernel keeps BOTH MLPs'
weights (and all activations) resident in VMEM for the entire horizon,
turning the rollout into a single MXU-bound program.

TPU-native formulation choices:
- no in-kernel concat: the first layer's matmul is split as
  x@W = z@Wz + a@Wa (two dots), so z and a never need to be joined.
- SimNorm (grouped softmax) without reshapes: for a per-row constant shift c,
  exp(x-c)/groupsum(exp(x-c)) equals the grouped softmax exactly, and the
  group sums are one matmul with a block-diagonal 0/1 mask — all MXU/VPU ops,
  no layout-hostile [S, L/g, g] reshapes.
- two-hot decode in-kernel: softmax over bins fused with the symexp-weighted
  bin sum.

Inference-only (the planner takes no gradients); the training update keeps
the XLA path. Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    # x * tanh(softplus(x)) with one exp instead of three transcendentals
    # (see models/layers.py mish — same identity, kept in sync)
    z = jnp.exp(jnp.minimum(x, 15.0)) + 1.0
    z2 = z * z
    return x * (z2 - 1.0) / (z2 + 1.0)


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rollout_kernel(
    z0_ref, actions_ref,
    dWz_ref, dWa_ref, db0_ref, dg0_ref, de0_ref,
    dW1_ref, db1_ref, dg1_ref, de1_ref,
    dW2_ref, db2_ref, dg2_ref, de2_ref,
    rWz_ref, rWa_ref, rb0_ref, rg0_ref, re0_ref,
    rW1_ref, rb1_ref, rg1_ref, re1_ref,
    rW2_ref, rb2_ref,
    bins_ref, gmask_ref,
    G_ref, zH_ref,
    *, horizon: int, discount: float, dot_dtype,
):
    f32 = jnp.float32

    def dot(x, w_ref):
        # weights arrive pre-cast to dot_dtype (bf16 on the fast path, the
        # same single-pass MXU precision XLA uses for f32 matmuls by
        # default); accumulation is always f32.
        return jnp.dot(x.astype(dot_dtype), w_ref[:],
                       preferred_element_type=f32)

    z = z0_ref[:]                                     # [S, L]
    G = jnp.zeros((z.shape[0], 128), f32)             # lane-padded accumulator
    disc = 1.0

    for t in range(horizon):
        a = actions_ref[t]                            # [S, A]

        # -- reward head: NormedLinear x2 (mish) -> Linear -> two-hot decode
        u = dot(z, rWz_ref) + dot(a, rWa_ref) + rb0_ref[:]
        u = _mish(_ln(u, rg0_ref[:], re0_ref[:]))
        u = dot(u, rW1_ref) + rb1_ref[:]
        u = _mish(_ln(u, rg1_ref[:], re1_ref[:]))
        logits = dot(u, rW2_ref) + rb2_ref[:]         # [S, B]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        r_symlog = (jnp.sum(e * bins_ref[:], axis=-1, keepdims=True)
                    / jnp.sum(e, axis=-1, keepdims=True))
        # symexp; exp(x)-1 instead of expm1 (not lowered by Mosaic) — the
        # absolute error near 0 is ~1e-7, irrelevant at planner precision
        r = jnp.sign(r_symlog) * (jnp.exp(jnp.abs(r_symlog)) - 1.0)

        G = G + disc * r                              # broadcast over lanes
        disc = disc * discount

        # -- dynamics: NormedLinear x2 (mish) -> NormedLinear -> SimNorm
        v = dot(z, dWz_ref) + dot(a, dWa_ref) + db0_ref[:]
        v = _mish(_ln(v, dg0_ref[:], de0_ref[:]))
        v = dot(v, dW1_ref) + db1_ref[:]
        v = _mish(_ln(v, dg1_ref[:], de1_ref[:]))
        v = dot(v, dW2_ref) + db2_ref[:]
        v = _ln(v, dg2_ref[:], de2_ref[:])
        # grouped softmax via block-diagonal mask matmul (exact)
        mv = jnp.max(v, axis=-1, keepdims=True)
        ev = jnp.exp(v - mv)
        denom = dot(ev, gmask_ref)
        z = ev / denom

    G_ref[:] = G
    zH_ref[:] = z


def _as_row(x):
    return x.reshape(1, -1)


def prepare_rollout_params(dyn, rew, latent_dim: int, simnorm_dim: int,
                           vmin: float, vmax: float, dot_dtype=jnp.bfloat16):
    """Pre-slice/cast the kernel's weight operands.

    Weights change only at update time; preparing them once per plan (or
    once per update) keeps the per-CEM-iteration kernel call free of cast/
    kron work.
    """
    L = latent_dim
    B = rew[2]['w'].shape[-1]
    bins = jnp.linspace(vmin, vmax, B, dtype=jnp.float32)
    gmask = jnp.kron(jnp.eye(L // simnorm_dim, dtype=jnp.float32),
                     jnp.ones((simnorm_dim, simnorm_dim), jnp.float32))

    def w(x):  # weight matrices feed the MXU in the compute dtype
        return x.astype(dot_dtype)

    return (
        w(dyn[0]['w'][:L]), w(dyn[0]['w'][L:]), _as_row(dyn[0]['b']),
        _as_row(dyn[0]['ln_w']), _as_row(dyn[0]['ln_b']),
        w(dyn[1]['w']), _as_row(dyn[1]['b']),
        _as_row(dyn[1]['ln_w']), _as_row(dyn[1]['ln_b']),
        w(dyn[2]['w']), _as_row(dyn[2]['b']),
        _as_row(dyn[2]['ln_w']), _as_row(dyn[2]['ln_b']),
        w(rew[0]['w'][:L]), w(rew[0]['w'][L:]), _as_row(rew[0]['b']),
        _as_row(rew[0]['ln_w']), _as_row(rew[0]['ln_b']),
        w(rew[1]['w']), _as_row(rew[1]['b']),
        _as_row(rew[1]['ln_w']), _as_row(rew[1]['ln_b']),
        w(rew[2]['w']), _as_row(rew[2]['b']),
        _as_row(bins), w(gmask),
    )


def rollout_prepared(prep, z0, actions, *, horizon: int, discount: float,
                     dot_dtype=jnp.bfloat16, interpret: bool = False,
                     block_s: int = 128):
    """Run the fused rollout with pre-prepared weights (trace-time helper;
    call inside a jitted planner).

    The sample axis is grid-blocked (`block_s` rows per program) so Mosaic
    pipelines one block's VPU epilogues against the next block's MXU work;
    weight operands use a constant index map and stay VMEM-resident across
    the whole grid.
    """
    S, L = z0.shape
    H, _, A = actions.shape
    args = (z0, actions) + tuple(prep)
    kernel = functools.partial(
        _rollout_kernel, horizon=horizon, discount=float(discount),
        dot_dtype=dot_dtype)

    if S % block_s != 0:
        block_s = S  # fall back to a single program

    def const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((block_s, L), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_s, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ] + [const_spec(p) for p in prep]

    G, zH = pl.pallas_call(
        kernel,
        grid=(S // block_s,),
        out_shape=(jax.ShapeDtypeStruct((S, 128), jnp.float32),
                   jax.ShapeDtypeStruct((S, L), jnp.float32)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_s, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return G[:, :1], zH


@functools.partial(
    jax.jit, static_argnames=('horizon', 'discount', 'simnorm_dim',
                              'vmin', 'vmax', 'interpret', 'dot_dtype'))
def fused_value_rollout(dyn, rew, z0, actions, *, horizon: int,
                        discount: float, simnorm_dim: int, vmin: float,
                        vmax: float, interpret: bool = False,
                        dot_dtype=jnp.bfloat16):
    """Fused H-step latent return rollout (one-shot convenience wrapper).

    dyn/rew: 3-layer MLP param tuples (layers.mlp_init layout); z0 [S, L];
    actions [H, S, A]. Returns (G [S, 1], zH [S, L]).
    """
    prep = prepare_rollout_params(dyn, rew, z0.shape[-1],
                                  simnorm_dim, vmin, vmax, dot_dtype)
    return rollout_prepared(prep, z0, actions, horizon=horizon,
                            discount=discount, dot_dtype=dot_dtype,
                            interpret=interpret)


# One-shot per-process canary verdict (None = not yet run).
_MOSAIC_CANARY = None

# Minimal standalone Mosaic program: proves the chip's kernel engine can
# compile AND execute at all. Runs in a SUBPROCESS because a wedged engine
# HANGS the fetch rather than raising (observed live 2026-08-20: after a
# training process was killed mid-Pallas-program, every later Mosaic
# execution on the chip blocked forever while plain XLA kept working) — an
# in-process probe would hang agent construction and anything behind it
# (bench.py, every queue slot). The child is killed on timeout; the parent
# never enqueues a Mosaic program.
_CANARY_SRC = """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0
x = jnp.zeros((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
assert float(y.sum()) == 8 * 128
print("MOSAIC_OK")
"""


def mosaic_engine_alive(timeout: float = 150.0) -> bool:
    """True when this backend can execute a Mosaic kernel end to end.

    TPU only (CPU/interpret tests have no engine to wedge); the verdict is
    cached per process. On failure/timeout the Pallas probes short-circuit
    to False and the agent uses the XLA planner (measured parity at the 5M
    geometry, docs/PERFORMANCE.md)."""
    global _MOSAIC_CANARY
    if _MOSAIC_CANARY is not None:
        return _MOSAIC_CANARY
    if jax.default_backend() != 'tpu':
        _MOSAIC_CANARY = True
        return True
    import subprocess
    import sys
    try:
        r = subprocess.run([sys.executable, '-c', _CANARY_SRC],
                           capture_output=True, text=True, timeout=timeout)
        _MOSAIC_CANARY = r.returncode == 0 and 'MOSAIC_OK' in r.stdout
        if not _MOSAIC_CANARY:
            print(f'[tdmpc2-tpu] Mosaic canary failed (rc={r.returncode}); '
                  'disabling Pallas kernels (XLA fallback)', flush=True)
    except Exception as e:  # noqa: BLE001 — timeout or spawn failure
        _MOSAIC_CANARY = False
        print(f'[tdmpc2-tpu] Mosaic canary {type(e).__name__}; the kernel '
              'engine is wedged or unreachable — disabling Pallas kernels '
              '(XLA fallback)', flush=True)
    return _MOSAIC_CANARY


# Child probe processes set this so the subprocess guard doesn't recurse.
_PROBE_CHILD_ENV = 'TDMPC2_TPU_PROBE_CHILD'

_PROBE_CHILD_SRC = """
import pickle, sys
import jax
try:
    from tdmpc2_tpu.train import _enable_compilation_cache
    _enable_compilation_cache()   # parent's in-process compile hits this cache
except Exception:
    pass
kind = sys.argv[1]
with open(sys.argv[2], 'rb') as f:
    args = pickle.load(f)
args = (jax.device_put(args[0]),) + args[1:]
if kind == 'value':
    from tdmpc2_tpu.ops.pallas_rollout import probe_value_kernel as probe
else:
    from tdmpc2_tpu.ops.pallas_cem import probe_cem_kernel as probe
print('PROBE_OK' if probe(*args) else 'PROBE_FAIL')
"""


def probe_in_subprocess(kind: str, args: tuple, timeout: float) -> bool:
    """Run a Pallas kernel probe in a killable child process first.

    The in-process probes cannot be time-boxed: a wedged Mosaic engine can
    hang the kernel COMPILE itself (observed live 2026-08-20: the tiny
    canary and the value kernel compiled fine while `cem_prepared`'s
    from_hlo blocked >7 minutes, stalling agent init, bench.py and every
    queue slot), and a stuck XLA compile holds the GIL so no signal or
    watchdog thread can interrupt it — only process death works. The child
    enables the persistent compilation cache, so a healthy probe's Mosaic
    compile is not paid twice by the parent's in-process probe. args[0] is
    the params pytree (device_get'd for pickling); non-TPU backends and
    child processes skip the guard (verdict True = proceed in-process)."""
    import os
    import pickle
    import subprocess
    import sys
    import tempfile
    from pathlib import Path
    if jax.default_backend() != 'tpu' or os.environ.get(_PROBE_CHILD_ENV):
        return True
    repo = str(Path(__file__).resolve().parents[2])
    env = dict(os.environ)
    env[_PROBE_CHILD_ENV] = '1'
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    fd, path = tempfile.mkstemp(suffix=f'.{kind}probe.pkl')
    try:
        with os.fdopen(fd, 'wb') as f:
            pickle.dump((jax.device_get(args[0]),) + tuple(args[1:]), f)
        r = subprocess.run([sys.executable, '-c', _PROBE_CHILD_SRC, kind,
                            path], capture_output=True, text=True,
                           timeout=timeout, env=env)
        ok = r.returncode == 0 and 'PROBE_OK' in r.stdout
        if not ok:
            print(f'[tdmpc2-tpu] {kind} probe child rc={r.returncode}; '
                  'falling back', flush=True)
        return ok
    except Exception as e:  # noqa: BLE001 — timeout/spawn failure = wedged
        print(f'[tdmpc2-tpu] {kind} probe child {type(e).__name__} — the '
              'Mosaic compile is wedged or too slow; falling back',
              flush=True)
        return False
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def probe_value_kernel(params, cfg, log_std_min, log_std_dif) -> bool:
    """Compile + execute the fused value kernel once on tiny shapes.

    Run at agent construction on TPU: if Mosaic fails to lower/compile/run
    the kernel on this chip/toolchain, the agent falls back to the XLA
    planner instead of dying inside the first jitted plan. Returns True on
    success; any exception (lowering, OOM, runtime) returns False. A
    subprocess canary (`mosaic_engine_alive`) runs first so a WEDGED kernel
    engine — which hangs instead of raising — also lands on the XLA path.
    """
    import numpy as np
    if not mosaic_engine_alive():
        return False
    if not probe_in_subprocess(
            'value', (params, cfg, log_std_min, log_std_dif), timeout=150.0):
        return False
    try:
        task = 0 if cfg.multitask else None
        mask = None
        if cfg.multitask and task is not None:
            mask = jnp.ones((cfg.action_dim,), jnp.float32)
        prep = prepare_value_params(params, cfg, task=task, action_mask=mask)
        # S=128 -> one grid block of exactly the production block shape
        # (the planner runs S=num_samples=512 as a 4-program grid of 128)
        S, L, A, H = 128, cfg.latent_dim, cfg.action_dim, cfg.horizon
        z0 = jnp.full((S, L), 1.0 / L, jnp.float32)
        actions = jnp.zeros((H, S, A), jnp.float32)
        eps = jnp.zeros((S, A), jnp.float32)
        qidx = jnp.arange(2, dtype=jnp.int32)
        discs = jnp.full((H + 1,), 0.99, jnp.float32) ** jnp.arange(H + 1)
        G = value_prepared(prep, z0, actions, eps, qidx, discs,
                           horizon=H, episodic=cfg.episodic,
                           log_std_min=float(log_std_min),
                           log_std_dif=float(log_std_dif))
        ok = bool(np.isfinite(np.asarray(G)).all())
        # Batched-acting path (TDMPC2._plan_vec vmaps the planner over the
        # env axis; the custom_vmap rule flattens envs into the sample axis
        # and indexes [N, 2]/[N, H+1] SMEM operands per env) lowers
        # differently — probe it too so vec training can't die in its
        # first jitted plan.
        n = 2
        Gv = jax.vmap(
            lambda z, a, e, qi: value_prepared(
                prep, z, a, e, qi, discs, horizon=H, episodic=cfg.episodic,
                log_std_min=float(log_std_min),
                log_std_dif=float(log_std_dif)),
        )(jnp.broadcast_to(z0, (n,) + z0.shape),
          jnp.broadcast_to(actions, (n,) + actions.shape),
          jnp.broadcast_to(eps, (n,) + eps.shape),
          jnp.broadcast_to(qidx, (n,) + qidx.shape))
        return ok and bool(np.isfinite(np.asarray(Gv)).all())
    except Exception as e:  # noqa: BLE001 — any failure means "use XLA"
        print(f'[tdmpc2-tpu] fused value kernel probe failed ({type(e).__name__}: '
              f'{e}); falling back to the XLA planner', flush=True)
        return False


def rollout_supported(cfg) -> bool:
    """Static gate for the fused value kernel.

    Covers single- AND multi-task (task emb folded into biases at prepare
    time) and episodic (termination head in-kernel) planners; requires the
    two-hot critic (num_bins>1) and SimNorm-divisible latents."""
    return cfg.num_bins > 1 and cfg.latent_dim % cfg.simnorm_dim == 0


# ---------------------------------------------------------------------------
# Fully fused CEM value estimate: rollout + terminal pi + 2-of-N Q decode.
#
# Extends the rollout kernel with the terminal bootstrap of
# `TDMPC2._estimate_value` (reference tdmpc2.py:122-136): after the H-step
# reward/dynamics rollout it evaluates the policy prior at z_H (tanh-squashed
# Gaussian sample), then the Q-ensemble on (z_H, a) for the two randomly
# subsampled heads (reference world_model.py:186-216), decodes both with the
# two-hot inverse, and returns G + gamma^H * mean(Q). Everything — all
# MLPs' weights and every activation — stays VMEM-resident, so one CEM
# iteration is a single MXU-bound program; the only XLA work left per
# iteration is the [S]-sized top-k/softmax moment update.
#
# Episodic tasks add the termination head in-kernel (sticky >0.5 gate on
# reward/bootstrap, reference tdmpc2.py:129-134). Multitask needs NO extra
# in-kernel work: the task embedding is constant across a plan, so its
# contribution to every head's first layer ([z, emb, a] @ W = z@Wz + a@Wa
# + emb@Wemb) folds into the layer BIAS at prepare time, and the action
# mask folds into the pi mean head's columns — the kernel itself is
# task-oblivious. Per-task discounts enter as a per-step discount row.
#
# RNG parity with the XLA path: the policy's eps ~ N(0,1) sample (pre-masked
# for multitask) and the 2-of-num_q head choice are data inputs, generated
# OUTSIDE with the exact key-split sequence of the XLA `_estimate_value`.
# ---------------------------------------------------------------------------


def _value_kernel(
    z0_ref, actions_ref, eps_ref, qidx_ref, discs_ref, *refs,
    horizon: int, episodic: bool, dot_dtype,
    log_std_min: float, log_std_dif: float, blocks_per_env: int,
):
    f32 = jnp.float32
    # Batched acting folds the env axis into the sample axis (see
    # value_prepared's custom_vmap rule): consecutive runs of
    # `blocks_per_env` grid programs belong to one env, and the per-env
    # scalar operands (Q-head subsample, discount row) are full [N, .]
    # SMEM arrays indexed by the program's env — full-array SMEM blocks
    # lower on all Mosaic versions, unlike vmap-tiled SMEM operands.
    env = pl.program_id(0) // blocks_per_env
    G_ref = refs[-1]
    it = iter(refs[:-1])

    def take(n):
        return [next(it) for _ in range(n)]

    (dWz, dWa, db0, dg0, de0, dW1, db1, dg1, de1,
     dW2, db2, dg2, de2) = take(13)
    (rWz, rWa, rb0, rg0, re0, rW1, rb1, rg1, re1, rW2, rb2) = take(11)
    if episodic:
        (tW0, tb0, tg0, te0, tW1, tb1, tg1, te1, tW2, tb2) = take(10)
    (pW0, pb0, pg0, pe0, pW1, pb1, pg1, pe1,
     pWm, pbm, pWl, pbl) = take(12)
    (qWz, qWa, qb0, qg0, qe0, qW1, qb1, qg1, qe1, qW2, qb2) = take(11)
    bins, gmask = take(2)

    def dot(x, w):
        # weights arrive pre-cast to dot_dtype; accumulation is always f32
        return jnp.dot(x.astype(dot_dtype), w, preferred_element_type=f32)

    def two_hot_dec(logits):
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        x = (jnp.sum(e * bins[:], axis=-1, keepdims=True)
             / jnp.sum(e, axis=-1, keepdims=True))
        # symexp via exp-1 (expm1 not lowered by Mosaic; ~1e-7 abs error)
        return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)

    z = z0_ref[:]                                     # [S, L]
    G = jnp.zeros((z.shape[0], 128), f32)             # lane-padded accumulator
    term = jnp.zeros((z.shape[0], 1), f32)            # sticky termination flag

    for t in range(horizon):
        a = actions_ref[t]                            # [S, A]
        u = dot(z, rWz[:]) + dot(a, rWa[:]) + rb0[:]
        u = _mish(_ln(u, rg0[:], re0[:]))
        u = dot(u, rW1[:]) + rb1[:]
        u = _mish(_ln(u, rg1[:], re1[:]))
        r = two_hot_dec(dot(u, rW2[:]) + rb2[:])
        if episodic:
            r = (1.0 - term) * r
        G = G + discs_ref[env, t] * r

        v = dot(z, dWz[:]) + dot(a, dWa[:]) + db0[:]
        v = _mish(_ln(v, dg0[:], de0[:]))
        v = dot(v, dW1[:]) + db1[:]
        v = _mish(_ln(v, dg1[:], de1[:]))
        v = dot(v, dW2[:]) + db2[:]
        v = _ln(v, dg2[:], de2[:])
        mv = jnp.max(v, axis=-1, keepdims=True)
        ev = jnp.exp(v - mv)
        z = ev / dot(ev, gmask[:])                    # grouped softmax

        if episodic:
            # termination head on the NEW latent; sticky >0.5 (logit>0) gate
            w = dot(z, tW0[:]) + tb0[:]
            w = _mish(_ln(w, tg0[:], te0[:]))
            w = dot(w, tW1[:]) + tb1[:]
            w = _mish(_ln(w, tg1[:], te1[:]))
            logit = dot(w, tW2[:]) + tb2[:]           # [S, 1]
            term = jnp.minimum(term + (logit > 0.0).astype(f32), 1.0)

    # -- terminal policy prior: a = tanh(mean + eps * exp(log_std))
    u = dot(z, pW0[:]) + pb0[:]
    u = _mish(_ln(u, pg0[:], pe0[:]))
    u = dot(u, pW1[:]) + pb1[:]
    u = _mish(_ln(u, pg1[:], pe1[:]))
    mean = dot(u, pWm[:]) + pbm[:]
    lstd = dot(u, pWl[:]) + pbl[:]
    lstd = log_std_min + 0.5 * log_std_dif * (jnp.tanh(lstd) + 1.0)
    a = jnp.tanh(mean + eps_ref[:] * jnp.exp(lstd))   # [S, A]

    # -- 2-of-num_q Q bootstrap, 'avg' decode
    q_acc = jnp.zeros((z.shape[0], 1), f32)
    for j in range(2):
        i = qidx_ref[env, j]
        u = dot(z, qWz[i]) + dot(a, qWa[i]) + qb0[pl.ds(i, 1), :]
        u = _mish(_ln(u, qg0[pl.ds(i, 1), :], qe0[pl.ds(i, 1), :]))
        u = dot(u, qW1[i]) + qb1[pl.ds(i, 1), :]
        u = _mish(_ln(u, qg1[pl.ds(i, 1), :], qe1[pl.ds(i, 1), :]))
        q_acc = q_acc + two_hot_dec(dot(u, qW2[i]) + qb2[pl.ds(i, 1), :])

    q = q_acc / 2.0
    if episodic:
        q = (1.0 - term) * q
    G_ref[:] = G + discs_ref[env, horizon] * q


def prepare_value_params(params, cfg, task=None, action_mask=None,
                         dot_dtype=jnp.bfloat16):
    """Pre-slice/cast every weight operand of the fused value kernel.

    Weights are loop-invariant across CEM iterations (and change only at
    update time); preparing once per plan keeps the kernel call free of
    cast/split/kron work. Returns a flat tuple of arrays.

    Multitask (`task` given): every head's first layer sees [z, emb, a] (or
    [z, emb]) — emb is constant for the whole plan, so emb @ W_emb is folded
    into the layer bias here, and the action mask is folded into the pi mean
    head's columns; the kernel never sees the task. Mirrors the reference's
    task-emb concat (world_model.py:88-101) exactly for a fixed task.
    """
    L, A = cfg.latent_dim, cfg.action_dim
    dyn, rew, pi, qs = (params['dynamics'], params['reward'], params['pi'],
                        params['Qs'])
    B = rew[2]['w'].shape[-1]
    bins = jnp.linspace(cfg.vmin, cfg.vmax, B, dtype=jnp.float32)
    gmask = jnp.kron(jnp.eye(L // cfg.simnorm_dim, dtype=jnp.float32),
                     jnp.ones((cfg.simnorm_dim, cfg.simnorm_dim), jnp.float32))

    if task is None:
        dt = 0
        emb = None
    else:
        dt = cfg.task_dim
        # task may be scalar or shape-[1]; emb is the 1-D embedding row with
        # the max_norm=1 lookup renorm of WorldModel.task_emb
        emb = params['task_emb']['w'][jnp.asarray(task)].reshape(-1)
        norm = jnp.linalg.norm(emb)
        emb = emb * jnp.minimum(1.0, 1.0 / jnp.maximum(norm, 1e-12))

    def w(x):
        return x.astype(dot_dtype)

    def fold(W, b):
        """First-layer bias with the constant emb contribution folded in.
        W rows are laid out [z (L) | emb (dt) | a (rest)]."""
        if emb is None:
            return _as_row(b)
        return _as_row(b + emb @ W[L:L + dt])

    def fold_q(W, b):
        if emb is None:
            return b
        return b + jnp.einsum('d,qdo->qo', emb, W[:, L:L + dt])

    pWm, pbm = pi[2]['w'][:, :A], pi[2]['b'][:A]
    if action_mask is not None:  # mask pi mean columns -> masked dims give 0
        pWm = pWm * action_mask.reshape(1, A)
        pbm = pbm * action_mask.reshape(A)

    prep = (
        # dynamics ([z, emb, a] -> L)
        w(dyn[0]['w'][:L]), w(dyn[0]['w'][L + dt:]), fold(dyn[0]['w'], dyn[0]['b']),
        _as_row(dyn[0]['ln_w']), _as_row(dyn[0]['ln_b']),
        w(dyn[1]['w']), _as_row(dyn[1]['b']),
        _as_row(dyn[1]['ln_w']), _as_row(dyn[1]['ln_b']),
        w(dyn[2]['w']), _as_row(dyn[2]['b']),
        _as_row(dyn[2]['ln_w']), _as_row(dyn[2]['ln_b']),
        # reward ([z, emb, a] -> bins)
        w(rew[0]['w'][:L]), w(rew[0]['w'][L + dt:]), fold(rew[0]['w'], rew[0]['b']),
        _as_row(rew[0]['ln_w']), _as_row(rew[0]['ln_b']),
        w(rew[1]['w']), _as_row(rew[1]['b']),
        _as_row(rew[1]['ln_w']), _as_row(rew[1]['ln_b']),
        w(rew[2]['w']), _as_row(rew[2]['b']),
    )
    if cfg.episodic:
        trm = params['termination']  # ([z, emb] -> 1)
        prep += (
            w(trm[0]['w'][:L]), fold(trm[0]['w'], trm[0]['b']),
            _as_row(trm[0]['ln_w']), _as_row(trm[0]['ln_b']),
            w(trm[1]['w']), _as_row(trm[1]['b']),
            _as_row(trm[1]['ln_w']), _as_row(trm[1]['ln_b']),
            w(trm[2]['w']), _as_row(trm[2]['b']),
        )
    prep += (
        # policy prior ([z, emb] -> 2A, final linear split into mean/log_std)
        w(pi[0]['w'][:L]), fold(pi[0]['w'], pi[0]['b']),
        _as_row(pi[0]['ln_w']), _as_row(pi[0]['ln_b']),
        w(pi[1]['w']), _as_row(pi[1]['b']),
        _as_row(pi[1]['ln_w']), _as_row(pi[1]['ln_b']),
        w(pWm), _as_row(pbm),
        w(pi[2]['w'][:, A:]), _as_row(pi[2]['b'][A:]),
        # Q ensemble, stacked [num_q, ...]; heads picked in-kernel by qidx
        w(qs[0]['w'][:, :L]), w(qs[0]['w'][:, L + dt:]),
        fold_q(qs[0]['w'], qs[0]['b']),
        qs[0]['ln_w'], qs[0]['ln_b'],
        w(qs[1]['w']), qs[1]['b'], qs[1]['ln_w'], qs[1]['ln_b'],
        w(qs[2]['w']), qs[2]['b'],
        # constants
        _as_row(bins), w(gmask),
    )
    return prep


def _value_flat(prep, z0, actions, eps, qidx, discs, *, horizon: int,
                episodic: bool, log_std_min: float, log_std_dif: float,
                dot_dtype, interpret: bool, block_s: int, s_per_env: int):
    """One pallas_call over N envs' samples flattened into one axis.

    z0 [N*S, L]; actions [H, N*S, A]; eps [N*S, A]; qidx [N, 2]; discs
    [N, H+1]. Consecutive `s_per_env // block_s` grid programs belong to one
    env; qidx/discs are full-array SMEM operands read per-env in-kernel.
    """
    S_tot, L = z0.shape
    H, _, A = actions.shape
    if s_per_env % block_s != 0:
        block_s = s_per_env
    kernel = functools.partial(
        _value_kernel, horizon=horizon, episodic=bool(episodic),
        dot_dtype=dot_dtype, log_std_min=float(log_std_min),
        log_std_dif=float(log_std_dif),
        blocks_per_env=s_per_env // block_s)

    def const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def smem_full(x):
        return pl.BlockSpec(x.shape, lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    qidx = qidx.astype(jnp.int32)
    discs = discs.astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((block_s, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_s, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_s, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
        smem_full(qidx),
        smem_full(discs),
    ] + [const_spec(p) for p in prep]

    G = pl.pallas_call(
        kernel,
        grid=(S_tot // block_s,),
        out_shape=jax.ShapeDtypeStruct((S_tot, 128), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_s, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z0, actions, eps, qidx, discs, *prep)
    return G[:, :1]


def value_prepared(prep, z0, actions, eps, qidx, discs, *, horizon: int,
                   episodic: bool, log_std_min: float, log_std_dif: float,
                   dot_dtype=jnp.bfloat16, interpret: bool = False,
                   block_s: int = 128):
    """Fused CEM value estimate with pre-prepared weights.

    z0 [S, L]; actions [H, S, A]; eps [S, A] (policy-sample noise, pre-masked
    for multitask); qidx [2] int32 (Q-head subsample); discs [H+1] f32
    (discount^t — data, not static, so per-task discounts trace cleanly).
    Returns value [S, 1].

    vmap-safe: batched acting (`TDMPC2._plan_vec` vmaps the planner over the
    env axis) hits a custom_vmap rule that folds the env axis into the
    sample axis — one flat pallas_call with N*S rows — instead of letting
    vmap tile the call, which Mosaic cannot lower for the small SMEM scalar
    operands (an [N, 2] operand gets a non-lane-aligned block).
    """
    prep = tuple(prep)
    kw = dict(horizon=horizon, episodic=episodic, log_std_min=log_std_min,
              log_std_dif=log_std_dif, dot_dtype=dot_dtype,
              interpret=interpret, block_s=block_s)

    @jax.custom_batching.custom_vmap
    def call(z0, actions, eps, qidx, discs, prep):
        return _value_flat(prep, z0, actions, eps, qidx[None], discs[None],
                           s_per_env=z0.shape[0], **kw)

    @call.def_vmap
    def _batched_call(axis_size, in_batched, z0, actions, eps, qidx, discs,
                      prep):
        zb, ab, eb, qb, db, pb = in_batched
        assert not any(jax.tree.leaves(pb)), (
            'fused value kernel: vmap over prepared weights is unsupported '
            '(plan-vec maps params with in_axes=None)')
        N = axis_size

        def bat(x, batched):
            return x if batched else jnp.broadcast_to(x, (N,) + x.shape)

        z0 = bat(z0, zb)                        # [N, S, L]
        actions = bat(actions, ab)              # [N, H, S, A]
        eps = bat(eps, eb)                      # [N, S, A]
        qidx = bat(qidx, qb)                    # [N, 2]
        discs = bat(discs, db)                  # [N, H+1]
        S, L = z0.shape[1:]
        H, A = actions.shape[1], actions.shape[3]   # actions [N, H, S, A]
        out = _value_flat(
            prep,
            z0.reshape(N * S, L),
            jnp.moveaxis(actions, 0, 1).reshape(H, N * S, A),
            eps.reshape(N * S, A),
            qidx, discs, s_per_env=S, **kw)
        return out.reshape(N, S, 1), True

    return call(z0, actions, eps, qidx, discs, prep)
