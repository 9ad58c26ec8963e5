"""Mesh parallelism: sharding rules + a full sharded training step on the
virtual 8-device CPU mesh (SURVEY.md §4 'Distributed' test strategy)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdmpc2_tpu import parallel
from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.tdmpc2 import TDMPC2



pytestmark = pytest.mark.slow  # sharded update steps + 2-process gloo

def test_parse_mesh_shape():
    assert parallel.parse_mesh_shape(None, 8) == (4, 2)
    assert parallel.parse_mesh_shape(None, 1) == (1, 1)
    assert parallel.parse_mesh_shape('2x4', 8) == (2, 4)
    assert parallel.parse_mesh_shape(8, 8) == (8, 1)
    with pytest.raises(AssertionError):
        parallel.parse_mesh_shape('2x2', 8)


def test_fsdp_sharding_rules():
    mesh = parallel.make_mesh('2x4')
    tree = {
        'big': jnp.zeros((256, 128)),      # 128 % 4 == 0 -> shard axis 0 (largest)
        'odd': jnp.zeros((3, 7)),          # small -> replicated
        'vec': jnp.zeros((64,)),           # small (< min_size) -> replicated
    }
    sh = parallel.fsdp_sharding(tree, mesh, min_size=1024)
    assert sh['big'].spec == jax.sharding.PartitionSpec('model', None)
    assert sh['odd'].spec == jax.sharding.PartitionSpec()
    assert sh['vec'].spec == jax.sharding.PartitionSpec()


def test_shard_batch_layout():
    mesh = parallel.make_mesh('4x2')
    obs = jnp.zeros((4, 8, 10))   # [T+1, B, D]
    task = jnp.zeros((8,), jnp.int32)
    sobs, stask = parallel.shard_batch((obs, task), mesh)
    assert sobs.sharding.spec == jax.sharding.PartitionSpec(None, 'data')
    assert stask.sharding.spec == jax.sharding.PartitionSpec('data')


def _tiny_cfg(**kw):
    cfg = Config(task='walker-walk', batch_size=16, latent_dim=32, mlp_dim=64,
                 enc_dim=32, num_q=2, num_bins=5, num_samples=16,
                 num_elites=4, num_pi_trajs=2, iterations=1, horizon=3)
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg = parse_cfg(cfg)
    cfg.obs_shape = {'state': (10,)}
    cfg.action_dim = 4
    cfg.episode_length = 100
    cfg.seed_steps = 100
    return cfg


def test_sharded_update_step_runs_and_matches_single_device():
    assert len(jax.devices()) >= 8, 'conftest must provide 8 CPU devices'
    mesh = parallel.make_mesh(devices=jax.devices()[:8])
    cfg = _tiny_cfg()
    agent = TDMPC2(cfg, mesh=mesh)

    # params got actually distributed across devices
    leaves = jax.tree.leaves(agent.state.params)
    sharded = [l for l in leaves if len(l.sharding.device_set) > 1]
    assert sharded, 'no parameter leaf was sharded over the mesh'

    T, B = cfg.horizon, cfg.batch_size
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((T + 1, B, 10)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (T, B, 4)), jnp.float32),
        jnp.asarray(rng.standard_normal((T, B, 1)), jnp.float32),
        jnp.zeros((T, B, 1), jnp.float32),
        None,
    )
    sbatch = parallel.shard_batch(batch, mesh)
    with mesh:
        new_state, info = agent._update_jit(agent.state, *sbatch)
    sharded_loss = float(info['total_loss'])
    assert np.isfinite(sharded_loss)

    # numerically equivalent to the unsharded step (same seed, same batch)
    cfg2 = _tiny_cfg()
    agent2 = TDMPC2(cfg2)
    _, info2 = agent2._update_jit(agent2.state, *batch)
    assert np.isclose(float(info2['total_loss']), sharded_loss,
                      rtol=1e-4, atol=1e-5)


def test_act_with_mesh():
    mesh = parallel.make_mesh(devices=jax.devices()[:8])
    agent = TDMPC2(_tiny_cfg(), mesh=mesh)
    with mesh:
        a = agent.act(np.zeros(10, np.float32), t0=True)
    assert a.shape == (4,)
    assert np.all(np.abs(a) <= 1.0)


def test_317M_param_tree_sharding_shapes():
    """FSDP rules shard every large leaf of the real 317M architecture
    (shape-only via eval_shape; the full model never materializes)."""
    from tdmpc2_tpu.models.world_model import WorldModel

    cfg = _tiny_cfg()
    for k, v in dict(enc_dim=4096, mlp_dim=4096, latent_dim=1376,
                     num_enc_layers=5, num_q=8, num_bins=101,
                     task_dim=96).items():
        setattr(cfg, k, v)
    cfg.multitask = True
    cfg.tasks = ['t%d' % i for i in range(80)]
    cfg.action_dims = [4] * 80
    cfg.episode_lengths = [100] * 80
    cfg.obs_shape = {'state': (128,)}

    wm = WorldModel(cfg)
    shapes = jax.eval_shape(lambda k: wm.init(k), jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    assert n_params > 250e6  # 317M-class

    mesh = parallel.make_mesh('2x4')
    shardings = parallel.fsdp_sharding(shapes, mesh)
    flat_shapes = jax.tree.leaves(shapes)
    flat_shard = jax.tree.leaves(shardings)
    unsharded_big = [
        (l.shape, s.spec) for l, s in zip(flat_shapes, flat_shard)
        if int(np.prod(l.shape)) >= 2 ** 20
        and s.spec == jax.sharding.PartitionSpec()]
    assert not unsharded_big, unsharded_big
    # per-device bytes drop ~4x on the 4-wide model axis
    total = sum(int(np.prod(l.shape)) * 4 for l in flat_shapes)
    per_dev = 0
    for l, s in zip(flat_shapes, flat_shard):
        n = int(np.prod(l.shape)) * 4
        per_dev += n // 4 if s.spec != jax.sharding.PartitionSpec() else n
    assert per_dev < 0.3 * total


def test_two_process_distributed_psum():
    """Two OS processes join via parallel.init_distributed (the
    scripts/launch_multihost.py path) and a psum over a cross-process mesh
    sees both contributions — the multi-host backend's one executable
    smoke (SURVEY.md §5.8; the reference has no distributed backend)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    worker = Path(__file__).parent / '_dist_worker.py'
    env = dict(os.environ)
    root = str(Path(__file__).resolve().parents[1])
    env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
    # the conftest's virtual 8-device flag would apply to BOTH workers;
    # keep the subprocesses at their natural single CPU device each
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert 'OK' in out, out
