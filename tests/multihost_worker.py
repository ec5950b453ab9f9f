"""Worker process for the 2-process multi-host smoke test.

Run by tests/test_multihost.py with JAX_PLATFORMS=cpu and 2 virtual
devices per process: initializes jax.distributed (the path wrapped by
lang2seg_tpu.parallel.mesh.initialize_multihost), builds the global
4-device data mesh, and runs a cross-process psum under shard_map.
Prints `PSUM <value>` on success.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import sys

import numpy as np


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from lang2seg_tpu.parallel.mesh import (initialize_multihost, make_mesh,
                                            batch_spec)
    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding

    assert jax.process_count() == num_procs, jax.process_count()
    devices = jax.devices()
    local = jax.local_devices()
    assert len(devices) == num_procs * len(local), (devices, local)

    mesh = make_mesh(len(devices), devices=devices)
    spec = batch_spec()

    # each process contributes its own host data (the multi-host loader
    # contract: per-process shards assembled into one global array)
    per_dev = 4
    local_rows = len(local) * per_dev
    host_data = (np.arange(local_rows, dtype=np.float32)
                 + 100.0 * proc_id).reshape(local_rows, 1)
    global_shape = (len(devices) * per_dev, 1)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), host_data, global_shape)

    def f(x):
        return jax.lax.psum(jnp.sum(x), "data")

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=spec,
                            out_specs=jax.sharding.PartitionSpec()))(arr)
    # expected: sum over all processes of their host_data
    expected = sum(
        float((np.arange(local_rows) + 100.0 * p).sum())
        for p in range(num_procs))
    got = float(out)
    assert abs(got - expected) < 1e-3, (got, expected)
    print(f"PSUM {got}", flush=True)


if __name__ == "__main__":
    main()
