"""Device mesh + sharding helpers.

The reference's only parallelism was single-process torch DataParallel over
4 GPUs (train_meta.py:137-141): replicate the model, scatter the batch,
gather outputs, with the support batch laid out n_cls*num_gpus so each
replica receives a full class set (dataset.py:348).

The TPU-native equivalent is a 1-D `data` mesh: the train step is written
over a leading replica-group axis R (see train.trainer), inputs are sharded
on that axis with NamedSharding, parameters are replicated, and XLA inserts
the gradient all-reduce over ICI. No NCCL calls, no scatter/gather code —
the sharding annotations are the entire distribution strategy.

Model size (~60 MB fp32) makes tensor/pipeline parallelism pointless; data
parallel is the only axis (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (replica-group) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """device_put a pytree (params/optimizer state) replicated on the mesh.

    REQUIRED before stepping a trainer with mesh-sharded batches: feeding
    single-device params next to sharded inputs makes XLA reshard the full
    parameter set on every call (measured 6x step slowdown on a 1-device
    mesh; the reshard also staggers partitions into the CPU collective
    rendezvous window — see __graft_entry__.dryrun_multichip).
    """
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
