#!/usr/bin/env python
"""Analytic FLOP accounting for the planner and update step (MFU math).

Counts matmul FLOPs (2 * in * out per applied Linear) from the ACTUAL param
pytree of the default bench agent (__graft_entry__._make_cfg geometry), then
multiplies by the exact application counts of the reference algorithm:

  plan   (reference tdmpc2/tdmpc2.py:138-206):
      encode(1 obs)
    + num_pi_trajs * horizon * (dynamics + pi)          # prior rollouts
    + iterations * num_samples * ( horizon * (dynamics + reward)
                                   + pi + 2 Q heads )   # value estimates
  update (reference tdmpc2/tdmpc2.py:259-332), batch B, horizon T:
      no-grad:  (T+1+T)*B encodes? no — encode(obs[0:T+1]) once: (T+1)*B
                + td_target: T*B * (pi + 2 target-Q heads)       [1x fwd]
      grad:     T*B*dynamics + T*B*reward + T*B*num_q Q + (T+1)*B? encoder
                -> counted 3x (fwd + ~2x bwd)
      pi update: (T+1)*B * (pi + 2 Q heads[no-grad for Q? Q params frozen,
                but activations still need grads through z? zs are detached;
                Q fwd is needed and backward w.r.t. pi params only])
                -> pi 3x, Q 2x (fwd + grad wrt inputs)

Elementwise work (SimNorm, LayerNorm, Mish, two-hot decode, softmax) is
omitted: it is HBM-bound, not MXU-bound, and <2% of matmul FLOPs at these
shapes.

Usage:
  python scripts/flops.py [plans_per_s] [updates_per_s] [peak_tflops]
Prints per-plan / per-update GFLOPs and, when rates are given, implied
TFLOP/s (and MFU when the chip's peak is given).
"""

from __future__ import annotations

import sys


def head_flops(tree) -> tuple:
    """(per-application FLOPs of one head, ensemble size) from a param
    subtree: every rank>=2 leaf is a Linear kernel; rank-3 leaves are
    ensemble-stacked [E, in, out]."""
    import jax
    per, ens = 0, 1
    for leaf in jax.tree.leaves(tree):
        if leaf.ndim == 2:
            per += 2 * leaf.shape[0] * leaf.shape[1]
        elif leaf.ndim == 3:
            ens = leaf.shape[0]
            per += 2 * leaf.shape[1] * leaf.shape[2]
    return per, ens


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, '.')
    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    p = agent.state.params

    enc, _ = head_flops(p['encoder'])
    dyn, _ = head_flops(p['dynamics'])
    rew, _ = head_flops(p['reward'])
    pi, _ = head_flops(p['pi'])
    q1, num_q = head_flops(p['Qs'])

    H, S, NP, IT = (cfg.horizon, cfg.num_samples, cfg.num_pi_trajs,
                    agent.iterations)
    B, T = cfg.batch_size, cfg.horizon

    plan = (enc
            + NP * H * (dyn + pi)
            + IT * S * (H * (dyn + rew) + pi + 2 * q1))

    fwd_nograd = (T + 1) * B * enc + T * B * (pi + 2 * q1)   # encode + td_target
    fwd_grad = T * B * (dyn + rew + num_q * q1)
    pi_upd = (T + 1) * B * (3 * pi + 2 * q1)
    update = fwd_nograd + 3 * fwd_grad + pi_upd

    print(f'heads (MFLOP/application): enc {enc/1e6:.2f}  dyn {dyn/1e6:.2f}  '
          f'reward {rew/1e6:.2f}  pi {pi/1e6:.2f}  Q {q1/1e6:.2f} x{num_q}')
    print(f'plan   ({IT} iters x {S} samples, {NP} prior trajs, H={H}): '
          f'{plan/1e9:.2f} GFLOP')
    print(f'update (B={B}, T={T}, fwd+2x bwd on grad path): '
          f'{update/1e9:.2f} GFLOP')

    args = [float(a) for a in sys.argv[1:]]
    if args:
        pps = args[0]
        print(f'planner @ {pps:,.0f} plans/s -> {plan*pps/1e12:.1f} TFLOP/s')
        if len(args) > 2 and args[2]:
            print(f'  planner MFU vs {args[2]:.0f} TFLOP/s peak: '
                  f'{100*plan*pps/1e12/args[2]:.1f}%')
    if len(args) > 1:
        ups = args[1]
        print(f'update  @ {ups:,.0f} steps/s -> {update*ups/1e12:.1f} TFLOP/s')
        if len(args) > 2 and args[2]:
            print(f'  update MFU vs {args[2]:.0f} TFLOP/s peak: '
                  f'{100*update*ups/1e12/args[2]:.1f}%')


if __name__ == '__main__':
    main()
