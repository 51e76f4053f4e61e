"""Device mesh and sharding helpers.

The reference scales with torch DDP over gloo/nccl (reference:
src/tha4/shion/core/training/distrib/distributed_trainer.py:45, :281-285,
:398-408 and DistributedDataParallel wrap in distributed_training_states.py
:182-187).  The TPU-native equivalent is a ``jax.sharding.Mesh`` with

  * ``data``  — distillation batch parallelism (DDP's allreduce becomes the
    psum XLA inserts for the sharded-batch gradient),
  * ``space`` — spatial parallelism over the pixel grid: the SIREN students
    are pixelwise, so H-dim sharding of their grids is collective-free until
    the final warp/composite (where GSPMD inserts the halo/all-gather).

Collectives ride ICI within a slice; across hosts, jax.distributed handles
DCN bootstrap (torchrun's rendezvous equivalent).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, space) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % space == 0
        data = n // space
    assert data * space == n, f"{data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch dim over 'data' and image rows over 'space' (NHWC)."""
    return NamedSharding(mesh, P("data", "space"))

def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of (N, ...) arrays with N sharded over 'data' and, for
    rank>=3 arrays (images), H sharded over 'space'."""
    def put(x):
        if x.ndim >= 3:
            spec = P("data", "space")
        elif x.ndim >= 1:
            spec = P("data")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def initialize_multihost(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Multi-host bootstrap (torchrun equivalent). No-op when single-process."""
    if jax.process_count() > 1 or coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
