"""Device mesh + sharding specs.

The reference has no distributed execution at all (single GPU, one sentence
per step — SURVEY.md §2.11); scale-out here is new design: data-parallel
over the expression batch on a 1-D `jax.sharding.Mesh` with XLA collectives
(psum over ICI) for gradient reduction. Model is replicated (at this model
scale TP is a non-goal; the mesh API leaves room for a 'model' axis).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices)
    assert len(devices) >= num_data, \
        f"need {num_data} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:num_data])
    return Mesh(dev_array, ("data",))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         shutdown_timeout_seconds: Optional[int] = None,
                         heartbeat_timeout_seconds: Optional[int] = None,
                         ) -> None:
    """Multi-host (DCN) initialization: wraps jax.distributed.initialize.
    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly elsewhere. Each host then loads its own data shard and the
    same shard_map train step runs data-parallel across all hosts (psum
    rides ICI within a slice and DCN across slices).

    shutdown_timeout_seconds: how long a terminating process waits for
    the others at the coordination-service shutdown barrier (jax default
    300s). Raise it when processes can skew by minutes — e.g. each
    cold-compiling the train step on a contended host.

    heartbeat_timeout_seconds: how long the coordinator tolerates a
    process not heartbeating before declaring it dead (jax default
    100s). Raise it when a process can be CPU-starved for minutes —
    e.g. several workers cold-compiling concurrently on few cores."""
    import jax.distributed
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if shutdown_timeout_seconds is not None:
        kwargs["shutdown_timeout_seconds"] = shutdown_timeout_seconds
    if heartbeat_timeout_seconds is not None:
        kwargs["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    jax.distributed.initialize(**kwargs)


def batch_spec() -> P:
    """Batch arrays shard on their leading axis."""
    return P("data")


def replicate_spec() -> P:
    return P()
