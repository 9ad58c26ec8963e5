#!/usr/bin/env python
"""Capture a jax.profiler trace of the hot steps and print an op-level
time breakdown (VERDICT r2 #7: a committed trace summary of the update
step, grounding the MFU numbers in per-op device time).

Traces three programs at bench geometry (default 5M agent, walker shapes):
  - plan chain: 20 MPPI plans inside one jit (the bench primary metric)
  - update: one donated training step (batch 256)
  - megastep: fused plan(8 envs) + replay sample + 8-update scan

Usage:
    python scripts/profile_step.py [--cpu] [--out docs/PROFILE_r3.md]

The xplane protobuf is parsed with tensorboard_plugin_profile
(framework_op_stats) and the top ops by self time are printed per program
and written to the --out markdown file. Raw traces stay in /tmp (large).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

# tensorboard_plugin_profile ships _pb2 files older than the installed
# protobuf C++ runtime; the pure-python implementation accepts them. Must be
# set before google.protobuf is first imported (i.e. before jax/tf).
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trace(fn, name, root):
    """Run fn() under a profiler trace; return the xplane path."""
    import jax
    tdir = os.path.join(root, name)
    os.makedirs(tdir, exist_ok=True)
    fn()  # warm (compile outside the trace)
    with jax.profiler.trace(tdir):
        fn()
    paths = glob.glob(os.path.join(tdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane trace written under {tdir}'
    return paths[0]


def _op_table(xplane_path, top=12):
    """Top HLO op categories/ops by self time, as (rows, total_us)."""
    from xprof.convert import raw_to_tool_data as rd
    data, _ = rd.xspace_to_tool_data([xplane_path], 'hlo_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    if isinstance(tbl, list):
        tbl = tbl[0]
    tbl = tbl['table'] if 'table' in tbl else tbl
    cols = [c.get('label', c.get('id', '')) for c in tbl['cols']]

    def find(*names):
        for n in names:
            for i, c in enumerate(cols):
                if n.lower() in str(c).lower():
                    return i
        raise KeyError(f'{names} not in {cols}')

    i_name = find('HLO op name', 'op name', 'operation')
    i_cat = find('category', 'type')
    i_self = find('self time (us)', 'self-time', 'self time')
    rows = []
    for r in tbl['rows']:
        c = [x['v'] if isinstance(x, dict) else x for x in r['c']]
        try:
            rows.append((str(c[i_name]), str(c[i_cat]), float(c[i_self])))
        except (TypeError, ValueError):
            continue
    rows.sort(key=lambda x: -x[2])
    total = sum(r[2] for r in rows)
    by_cat = {}
    for _, cat, us in rows:
        by_cat[cat] = by_cat.get(cat, 0.0) + us
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    return rows[:top], total, cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--out', default=None, help='markdown summary path')
    ap.add_argument('--top', type=int, default=12)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_cfg
    from tdmpc2_tpu.tdmpc2 import TDMPC2

    cfg = _make_cfg()
    agent = TDMPC2(cfg)
    obs_dim = cfg.obs_shape['state'][0]
    T, B, A = cfg.horizon, cfg.batch_size, cfg.action_dim
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix='tdmpc2_profile_')
    device = jax.devices()[0]
    programs = {}

    # -- plan chain (20 plans in one jit)
    obs = jnp.zeros((1, obs_dim), jnp.float32)
    prep = agent._cached_prep(None)
    pm0, key0 = agent.state.prev_mean[0], agent.state.key
    t0 = jnp.asarray(False)

    def plan_chain(params, obs, pm, k, prep):
        def body(carry, _):
            pm, k = carry
            a, pm, k = agent._plan(params, obs, pm, t0, k, None, prep,
                                   eval_mode=False)
            return (pm, k), a
        (pm, k), actions = jax.lax.scan(body, (pm, k), None, length=20)
        return actions[-1]
    chain = jax.jit(plan_chain)

    def run_chain():
        jax.block_until_ready(chain(agent.state.params, obs, pm0, key0, prep))
    programs['plan_chain_20'] = _trace(run_chain, 'plan', root)

    # -- the same chain on the pure-XLA planner: the Pallas CEM kernel is one
    # opaque custom-call in HLO stats, so this variant is where the planner's
    # per-op time actually becomes visible (both modes measure within 0.5%
    # of each other, docs/PERFORMANCE.md "Kernels").
    cfg_x = cfg.replace(use_pallas=False)
    agent_x = TDMPC2(cfg_x)
    prep_x = agent_x._cached_prep(None)

    def plan_chain_x(params, obs, pm, k, prep):
        def body(carry, _):
            pm, k = carry
            a, pm, k = agent_x._plan(params, obs, pm, t0, k, None, prep,
                                     eval_mode=False)
            return (pm, k), a
        (pm, k), actions = jax.lax.scan(body, (pm, k), None, length=20)
        return actions[-1]
    chain_x = jax.jit(plan_chain_x)

    def run_chain_x():
        jax.block_until_ready(
            chain_x(agent_x.state.params, obs, pm0, key0, prep_x))
    programs['plan_chain_20_xla'] = _trace(run_chain_x, 'plan_xla', root)

    # -- one training update (per-call executable, batch 256)
    batch = (
        jnp.asarray(rng.standard_normal((T + 1, B, obs_dim)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, A)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32))
    upd = jax.jit(agent._update)  # non-donating: re-runnable on same state

    def run_update():
        st, info = upd(agent.state, *batch)
        jax.block_until_ready(info['total_loss'])
    programs['update_b256'] = _trace(run_update, 'update', root)

    # -- fused megastep (8 envs) — identical fixture to bench.py's metric
    from bench import make_megastep_fixture
    mega, buf, obs_v, t0_v = make_megastep_fixture(cfg, 8, rng)

    def run_mega():
        mega.vec_step(buf, obs_v, t0_v, 8)
    programs['megastep_8env'] = _trace(run_mega, 'megastep', root)

    # -- summarize
    lines = [f'# Profile: per-op device time '
             f'({device.platform} {getattr(device, "device_kind", "?")}, '
             f'default 5M agent, walker shapes)', '',
             'Captured with `python scripts/profile_step.py`; HLO op stats',
             '(xprof `hlo_stats`) over a jax.profiler trace of each warmed',
             'program. Device rows exist only on TPU/GPU traces — a CPU run',
             'validates the pipeline but reports empty tables.', '']
    for name, path in programs.items():
        rows_, total, cats = _op_table(path, args.top)
        lines.append(f'## {name} — total self time {total / 1e3:.2f} ms')
        lines.append('')
        if not rows_:
            lines.append('(no device HLO rows in this trace)')
            lines.append('')
            continue
        lines.append('By category (sums to 100% of device self time):')
        lines.append('')
        lines.append('| category | self us | % |')
        lines.append('|---|---|---|')
        for cat, us in cats:
            lines.append(f'| {cat[:32]} | {us:.0f} | '
                         f'{100 * us / max(total, 1e-9):.1f} |')
        lines.append('')
        lines.append(f'Top {len(rows_)} ops:')
        lines.append('')
        lines.append('| HLO op | category | self us | % |')
        lines.append('|---|---|---|---|')
        for op, typ, us in rows_:
            lines.append(f'| {op[:60]} | {typ[:24]} | {us:.0f} | '
                         f'{100 * us / max(total, 1e-9):.1f} |')
        lines.append('')
    text = '\n'.join(lines)
    print(text)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(text + '\n')
        print(f'[profile_step] wrote {args.out}', file=sys.stderr)


if __name__ == '__main__':
    main()
