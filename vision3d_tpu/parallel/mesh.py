"""Device mesh + sharding helpers (batch data parallelism over ICI/DCN).

The reference is single-GPU with no distributed backend (SURVEY §2.4);
the TPU-native equivalent of its NCCL-absence is a 1-D ``jax.sharding``
mesh with batch-sharded inputs and replicated parameters — XLA inserts the
gradient all-reduce (psum over ICI) automatically from the shardings.
A second ("model") axis is reserved for future tensor parallelism; the
~2M-param SECOND never needs it, so it defaults to size 1.

Multi-host (one process per host, pods/multi-slice): call
``initialize_distributed()`` first; ``make_mesh()`` then arranges the
global device set DCN-major (``mesh_utils.create_hybrid_device_mesh``),
so the slices of the data axis that live on one host are ICI-contiguous
and the per-step gradient psum does one hierarchical reduce — ICI within
a host, a single DCN exchange across hosts. ``shard_batch``/``replicate``
assemble global arrays from per-process local data
(``jax.make_array_from_process_local_data``); each process feeds only its
own shard of the global batch (see DataLoader num_shards/shard_id).
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> bool:
    """Initialize JAX's multi-process runtime (no-op when single-process).

    Strictly opt-in (single-host environments may define TPU metadata
    vars that JAX's auto-discovery trips over): set COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID for an explicit coordinator, or
    VISION3D_MULTIHOST=1 to use JAX's Cloud TPU cluster auto-discovery.
    Must run before the first backend use in the process. Returns True if
    the distributed runtime was initialized.
    """
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
        return True
    if os.environ.get("VISION3D_MULTIHOST") == "1":
        jax.distributed.initialize()
        return True
    return False


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        n_local = jax.local_device_count()
        assert n_local % model_parallel == 0, (n_local, model_parallel)
        # DCN-major data axis: per-host ICI groups stay contiguous, so the
        # data-axis psum lowers to (ICI reduce) + (one DCN all-reduce)
        arr = mesh_utils.create_hybrid_device_mesh(
            (n_local // model_parallel, model_parallel),
            (jax.process_count(), 1),
        )
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree batch-sharded across the mesh's data axis.

    Single-process: a plain device_put of the (global) batch. Multi-host:
    each process passes its LOCAL shard (global_batch / process_count
    leading dim) and the global array is assembled without any cross-host
    data movement.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh.

    Multi-host: every process must hold the same host values (same PRNG
    seed / same restored checkpoint); each contributes its local copy.
    """
    s = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x), np.shape(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
