"""Device mesh + sharding helpers (the DDP/NCCL replacement).

The reference scales with single-node ``DistributedDataParallel`` over NCCL
(setup/base.py:487-506, train_utils/torchrun.py:9-31). TPU-native equivalent:
one ``jax.sharding.Mesh`` over all chips with a ``data`` axis; the global
batch is sharded along it, parameters are replicated, and the gradient
all-reduce is inserted by XLA (riding ICI) when the jitted train step reduces
the per-sample loss. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no code change in the step function.

Batch axis conventions: every array in a batch pytree is sharded on its
*batch* dimension. Our train-step batches carry feats as [A, T, B, F]
(accumulation-major, time-major) so the batch dim index varies per leaf;
``shard_batch`` takes an explicit dim map or assumes dim 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_dim: int = 0, ndim: int = 1) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def init_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Initialise multi-host JAX (reference equivalent: torchrun +
    dist.init_process_group, train_utils/torchrun.py:9-31 — here one
    controller process per host over DCN, same mesh code afterwards)."""
    import jax

    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def shard_batch_multihost(mesh: Mesh, local_batch, batch_dims=None):
    """Assemble a global sharded batch from per-host local shards
    (jax.make_array_from_process_local_data); host h contributes the rows
    its data loader produced (loaders shard by process_index)."""
    import jax

    if batch_dims is None:
        batch_dims = jax.tree.map(lambda _: 0, local_batch)

    def build(x, d):
        sharding = batch_sharding(mesh, d, np.ndim(x))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(build, local_batch, batch_dims)


def shard_batch(mesh: Mesh, batch, batch_dims=None):
    """device_put a batch pytree with each leaf sharded on its batch dim.

    batch_dims: optional pytree (matching structure) of ints giving the batch
    dimension per leaf; defaults to 0 everywhere.
    """
    if batch_dims is None:
        batch_dims = jax.tree.map(lambda _: 0, batch)
    shardings = jax.tree.map(
        lambda x, d: batch_sharding(mesh, d, np.ndim(x)), batch, batch_dims
    )
    return jax.device_put(batch, shardings)
