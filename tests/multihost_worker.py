"""Worker process for the 2-process multi-host smoke tests.

Run by tests/test_multihost.py with JAX_PLATFORMS=cpu and 2 virtual
devices per process: initializes jax.distributed (the path wrapped by
lang2seg_tpu.parallel.mesh.initialize_multihost) and builds the global
4-device data mesh. Default mode runs a cross-process psum under
shard_map and prints `PSUM <value>`; `--train` runs ONE step of the
PRODUCT sharded train step (make_sharded_train_step) over the global
mesh — params replicated across processes, batch sharded 4 ways — and
prints `TRAINLOSS <value>` (identical on every process by pmean).

Usage: python multihost_worker.py <coordinator> <n> <proc_id> [--train]
"""

import sys

import numpy as np


def train_mode(mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.parallel.train import make_sharded_train_step
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from tests.test_network import tiny_config

    cfg = tiny_config()
    model, tx, state = create_train_state(cfg)
    step = make_sharded_train_step(model, cfg, tx, mesh)

    shards = len(mesh.devices.flat)
    blocks = []
    for s in range(shards):
        b = synthetic_batch(cfg, 1, 2, seed=s)
        b["expr_uid"] = np.arange(2, dtype=np.int32) + 2 * s
        blocks.append(b)
    gbatch = {k: np.concatenate([np.asarray(b[k]) for b in blocks], 0)
              for k in blocks[0]}

    # every process holds identical host values (same seeds); globalize
    # via callbacks that slice the global value per device
    data_s = NamedSharding(mesh, P("data"))
    rep_s = NamedSharding(mesh, P())
    batch = {k: jax.make_array_from_callback(
        v.shape, data_s, lambda idx, v=v: v[idx])
        for k, v in gbatch.items()}
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), rep_s, lambda idx, x=np.asarray(x): x[idx]),
        state)

    new_state, losses = step(state, batch)
    loss = float(losses["total_loss"])
    assert np.isfinite(loss), loss
    print(f"TRAINLOSS {loss:.6f}", flush=True)


def eval_mode(mesh):
    """eval_split_mesh across OS processes: images round-robined over
    the global 4-device mesh, per-process host drains of the replicated
    (all-gathered) outputs. Asserts the result equals the serial
    single-device protocol IN-PROCESS, then prints `EVALSUM <json>`
    (identical on every process by construction)."""
    import json

    import numpy as np

    from lang2seg_tpu.engine.train_state import create_train_state
    from lang2seg_tpu.engine.evaluator import Evaluator
    from lang2seg_tpu.data.synthetic import synthetic_batch
    from tests.test_network import tiny_config

    cfg = tiny_config()
    cfg.data.max_orig_h = cfg.data.canvas_h
    cfg.data.max_orig_w = cfg.data.canvas_w
    model, tx, state = create_train_state(cfg)  # same seed -> same params
    ev = Evaluator(model, cfg, device_paste=True)

    batches = []
    for s in range(5):   # 5 images on 4 devices: one padded chunk
        b = synthetic_batch(cfg, 1, 2, seed=s)
        batches.append({"images": b["images"], "im_hw": b["im_hw"],
                        "labels": b["labels"], "gt_boxes": b["gt_boxes"],
                        "gt_masks": b["gt_masks"],
                        "im_scale": np.float32(1.0)})
    batches[1]["sent_valid"] = np.array([True, False])

    got = ev.eval_split_mesh(state.params, [dict(b) for b in batches],
                             mesh)
    ref = ev.eval_split(state.params, [dict(b) for b in batches])
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-9, (k, got[k], ref[k])
    print("EVALSUM " + json.dumps(got, sort_keys=True), flush=True)


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from lang2seg_tpu.parallel.mesh import (initialize_multihost, make_mesh,
                                            batch_spec)
    # generous barriers: both workers cold-compile the train step
    # concurrently on this host's ONE core, so (a) the first to finish
    # can sit minutes at the exit barrier waiting for the other (the jax
    # default 300s shutdown barrier killed both under compile skew) and
    # (b) a worker can be CPU-starved past the default 100s heartbeat
    # window mid-compile, which makes the coordinator declare it dead
    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id,
                         shutdown_timeout_seconds=1800,
                         heartbeat_timeout_seconds=900)

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding

    assert jax.process_count() == num_procs, jax.process_count()
    devices = jax.devices()
    local = jax.local_devices()
    assert len(devices) == num_procs * len(local), (devices, local)

    mesh = make_mesh(len(devices), devices=devices)
    if "--train" in sys.argv:
        train_mode(mesh)
        return
    if "--eval" in sys.argv:
        eval_mode(mesh)
        return
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
