#!/usr/bin/env python
"""Compile + run the fused CEM value kernel on the real chip at the default
planner geometry (512 samples, horizon 3, 5M model). Exits non-zero if the
kernel fails to lower/compile/execute, so launch scripts can fall back to
`use_pallas=false`."""

import sys

import numpy as np


def main():
    import jax
    from tdmpc2_tpu.train import _enable_compilation_cache
    _enable_compilation_cache()   # pre-warm the shared executable cache so
    # bench.py (same planner geometry) skips the slow first Mosaic compile

    if jax.default_backend() != 'tpu':
        print('not on TPU; nothing to smoke-test')
        return 0

    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    assert agent._fused_rollout, 'fused kernel gate unexpectedly off'
    obs = np.zeros((cfg.obs_shape['state'][0],), np.float32)
    a = agent.act(obs, t0=True)
    a2 = agent.act(obs, t0=False)
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(a2)).all()
    # batched acting (vec trainer, num_envs=8): vmapped planner — a separate
    # Mosaic lowering (custom_vmap env-flattening rule); must also run
    cfg8 = _make_cfg(num_envs=8)
    agent8 = TDMPC2(cfg8)
    obs8 = np.zeros((8, cfg.obs_shape['state'][0]), np.float32)
    a8 = agent8.act(obs8, t0=np.ones(8, bool))
    assert a8.shape == (8, cfg.action_dim) and np.isfinite(a8).all()
    print('fused value kernel OK (single + 8-env batched):', np.asarray(a))
    return 0


if __name__ == '__main__':
    sys.exit(main())
