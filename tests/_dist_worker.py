"""Worker for tests/test_parallel.py::test_two_process_distributed_psum.

Launched as `python tests/_dist_worker.py <process_id> <num_processes>
<coordinator_port>`: initializes multi-process JAX through the framework's
`parallel.init_distributed` (scripts/launch_multihost.py uses the same path),
builds a global mesh spanning both processes' CPU devices, and checks a psum
over the `data` axis sees every process's contribution. Exercises the
multi-host code path SURVEY.md §5.8 obligates, without TPU pods (Gloo-backed
CPU collectives)."""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from tdmpc2_tpu import parallel
    parallel.init_distributed(
        coordinator_address=f'127.0.0.1:{port}', num_processes=n,
        process_id=pid)
    assert jax.process_count() == n, jax.process_count()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(jax.devices(), ('data',))
    local = jnp.ones((8,)) * (pid + 1)
    arr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P('data'))

    def f(a):
        return jax.lax.psum(jnp.sum(a), 'data')

    out = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P('data'),
                                out_specs=P()))(arr)
    val = float(jax.device_get(out).reshape(-1)[0])
    expect = float(8 * sum(range(1, n + 1)))
    assert abs(val - expect) < 1e-5, (val, expect)
    print(f'[proc {pid}] psum={val} OK', flush=True)


if __name__ == '__main__':
    main()
