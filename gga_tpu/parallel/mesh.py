"""Device mesh + sharding helpers.

The reference's only parallelism is single-program data parallelism over
NCCL DDP (SURVEY.md §2.4; /root/reference/mmdet3d/utils/util_distribution.py,
tools/dist_train.sh). The TPU-native equivalent: one ``Mesh(('data',))``
over ICI (multi-host extends over DCN), batch sharded on axis 0, params
replicated, and a single jitted train step — XLA GSPMD inserts the gradient
all-reduce and makes every cross-batch reduction (e.g. batch norm moments)
globally synchronized, subsuming the reference's NaiveSyncBatchNorm
(/root/reference/mmdet3d/ops/norm.py:29).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None, axis_name='data'):
    """1D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Sharding for arrays whose axis 0 is the global batch."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh):
    """Fully replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name='data'):
    """Device-put a pytree of host arrays with axis 0 sharded over the
    mesh (axis 0 must divide by mesh size)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def process_shard(order, num_processes, process_id):
    """Deterministic per-process slice of a global sample order (the
    reference's DistributedGroupSampler rank split,
    /root/reference/mmdet3d — torch DistributedSampler semantics): pad
    to a multiple of ``num_processes`` by wrapping, then stride so every
    process sees a disjoint, equally-sized shard. Same ``order`` in =>
    same shards out on every host."""
    order = np.asarray(order)
    n = len(order)
    total = -(-n // num_processes) * num_processes
    padded = np.concatenate([order, order[:total - n]])
    return padded[process_id::num_processes]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization (the reference's init_dist /
    dist_train.sh NNODES path, SURVEY.md §2.4). On a single host this is a
    no-op; on multi-host pods call before any jax device use and build the
    mesh over jax.devices() — data-parallel batches shard over ICI within
    a host and DCN across hosts automatically."""
    import jax
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
