"""Device-mesh parallelism utilities.

The reference is strictly single-device (`cuda:0` hard-coded,
reference: tdmpc2/tdmpc2.py:20, common/buffer.py:15) — this module is a
TPU-native build obligation with no reference counterpart (SURVEY.md §2.2):

- `make_mesh`           — build a `jax.sharding.Mesh` with ('data', 'model')
                          axes from a "DxM" spec or a device count.
- `fsdp_sharding`       — ZeRO-3/FSDP-style `NamedSharding` for an arbitrary
                          pytree: each leaf's largest mesh-divisible axis is
                          sharded over the 'model' axis, small leaves are
                          replicated. Applied to params, target params, and
                          both optimizer states, this shards the 317M-param
                          multi-task model plus its Adam moments across chips;
                          XLA inserts the all-gathers/reduce-scatters over ICI.
- `batch_sharding`      — `NamedSharding` for [T, B, ...] training batches,
                          sharding the batch axis over 'data' (data
                          parallelism; gradient psum is automatic under jit).
- `shard_state/batch`   — `device_put` helpers applying the above.
- `init_distributed`    — `jax.distributed.initialize` wrapper for multi-host.

There is deliberately no PP/SP/EP here: TD-MPC2 has no attention, no long
sequences (horizon=3), and no experts (SURVEY.md §5.7) — DP + FSDP over a 2-D
mesh covers the model family.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def parse_mesh_shape(spec, n_devices: int) -> tuple:
    """Parse a mesh spec into (data, model) sizes.

    spec may be "4x2" (data x model), an int (data size, model=rest), or
    None (auto: model axis of 2 when the device count is even, else 1).
    """
    if spec is None:
        model = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
        return n_devices // model, model
    if isinstance(spec, int):
        assert n_devices % spec == 0, (spec, n_devices)
        return spec, n_devices // spec
    d, m = (int(x) for x in str(spec).lower().split('x'))
    assert d * m == n_devices, f'mesh {d}x{m} != {n_devices} devices'
    return d, m


def make_mesh(spec=None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    d, m = parse_mesh_shape(spec, len(devices))
    return Mesh(np.asarray(devices).reshape(d, m), (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(x, mesh_model: int, min_size: int) -> P:
    """FSDP rule: shard the largest axis divisible by the model-axis size."""
    shape = getattr(x, 'shape', ())
    if not shape or int(np.prod(shape)) < min_size or mesh_model <= 1:
        return P()
    axes = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in axes:
        if shape[ax] % mesh_model == 0 and shape[ax] >= mesh_model:
            spec = [None] * len(shape)
            spec[ax] = MODEL_AXIS
            return P(*spec)
    return P()


def fsdp_sharding(tree, mesh: Mesh, min_size: int = 2 ** 12):
    """NamedSharding tree sharding big leaves over the 'model' mesh axis."""
    m = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, m, min_size)), tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 1) -> NamedSharding:
    """Sharding for training batches; batch axis over 'data'.

    The update batch layout is [T, B, ...] (batch_axis=1, see
    tdmpc2_tpu/data/buffer.py sample()); per-leaf ndim differences are
    handled by `shard_batch`.
    """
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 1):
    """device_put each batch leaf with its batch axis over 'data'.

    Leaves with fewer dims than `batch_axis+1` (e.g. per-sample task ids,
    shape [B]) are sharded on axis 0.
    """
    def put(x):
        if x is None:
            return None
        ax = batch_axis if x.ndim > batch_axis else x.ndim - 1
        spec = [None] * (ax + 1)
        spec[ax] = DATA_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, batch)


def shard_state(state, mesh: Mesh, min_size: int = 2 ** 12):
    """device_put a TrainState: FSDP-shard every large leaf, replicate rest."""
    shardings = fsdp_sharding(state, mesh, min_size=min_size)
    return jax.device_put(state, shardings)


def seed_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for fleet pytrees whose leading axis is the seed axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_seed_axis(tree, mesh: Mesh):
    """device_put every leaf of a seed-stacked pytree (leading [K] axis)
    with the seed axis over the 'data' mesh axis.

    Fleet training is embarrassingly parallel over seeds — each device
    owns K/data_size seeds' params, optimizer state, replay storage and
    env batch, and the compiled act/update/megastep programs run SPMD with
    no collectives (the only cross-seed op is the scalar metrics mean).
    K must be divisible by the data-axis size.
    """
    sh = seed_sharding(mesh)

    def put(x):
        d = mesh.shape[DATA_AXIS]
        assert getattr(x, 'ndim', 0) > 0, \
            f'seed-stacked leaf expected, got 0-d {x!r}'
        k = x.shape[0]
        assert k % d == 0, (
            f'seed axis {k} not divisible by data-axis size {d}')
        return jax.device_put(x, sh)
    return jax.tree.map(put, tree)
