"""Device mesh construction and sharding helpers.

This replaces torch DataParallel (robosat/tools/train.py:69, predict.py:63)
wholesale: parallelism is declared, not programmed. A 1-D mesh over all chips
with the batch axis sharded gives data parallelism; XLA inserts the psum over
ICI for gradients and the all-gathers for replicated params. Multi-host runs
initialize jax.distributed before building the mesh.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_distributed_initialized = False


def maybe_init_distributed():
    """Initialize the multi-host JAX runtime when launched under a cluster.

    Set RS_COORDINATOR (host:port), RS_NUM_PROCESSES, and RS_PROCESS_ID on
    every host to form the process group; single-host runs are untouched.
    XLA then compiles collectives over ICI within a slice and DCN across
    slices — the multi-node story the reference never had (SURVEY.md 2.2).
    """
    global _distributed_initialized
    coordinator = os.environ.get("RS_COORDINATOR")
    if not coordinator or _distributed_initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(os.environ["RS_NUM_PROCESSES"]),
        process_id=int(os.environ["RS_PROCESS_ID"]),
    )
    _distributed_initialized = True


def create_mesh(devices=None, axis=DATA_AXIS):
    """A 1-D mesh over all (or the given) devices."""
    maybe_init_distributed()
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh, ndim, axis=DATA_AXIS):
    """NamedSharding splitting dim 0 (batch) over the mesh, rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh):
    """Fully replicated sharding (params, small state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, array, axis=DATA_AXIS):
    """Place a host array onto the mesh, batch-dim sharded."""
    return jax.device_put(array, batch_sharding(mesh, array.ndim, axis))


def replicate(mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sharding), tree)
