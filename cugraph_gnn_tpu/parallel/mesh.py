"""Mesh creation and axis conventions.

TPU-native replacement for the reference's communicator bootstrap
(ref cpp/src/wholememory/communicator.cpp:398-605 rank-topology exchange;
python/pylibwholegraph/torch/comm.py:62-289 global/local-node/local-device
communicator registry).  On TPU there is no unique-id handshake: the JAX
coordinator (`jax.distributed.initialize`) plays that role, and the
"communicators" collapse to named axes of a `jax.sharding.Mesh`:

- axis ``"store"`` — the axis feature/embedding rows are sharded over
  (the reference's *global* communicator).
- axis ``"data"``  — optional data-parallel replication axis for model
  params / seed shards (the reference's DDP).

A two-level (ICI x DCN) hierarchy (the reference's local-node + global
communicators / MT_HIERARCHY memory) maps to a 2D mesh
``("node", "device")``; helpers below construct both.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STORE_AXIS = "store"
DATA_AXIS = "data"


def create_store_mesh(num_devices: Optional[int] = None,
                      devices=None) -> Mesh:
    """1-D mesh over all devices; feature rows shard over ``store``."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (STORE_AXIS,))

def create_hierarchical_mesh(num_nodes: int, devices=None) -> Mesh:
    """2-D (node, device) mesh — the MT_HIERARCHY analog
    (ref cpp/src/wholememory_ops/gather_op_impl_hierarchy.cu:23-349):
    inner axis rides ICI, outer axis DCN."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % num_nodes == 0, (n, num_nodes)
    arr = np.asarray(devices).reshape(num_nodes, n // num_nodes)
    return Mesh(arr, ("node", "device"))


def row_sharding(mesh: Mesh, axis: str = STORE_AXIS) -> NamedSharding:
    """Rows partitioned over ``axis``, feature dim replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis_size(mesh: Mesh, axis: str = STORE_AXIS) -> int:
    return mesh.shape[axis]


def split_mesh(mesh: Mesh, group_size: int, axis: str = STORE_AXIS):
    """Split a 1-D mesh into disjoint sub-meshes of ``group_size``
    devices (the reference's communicator split,
    ref wholememory.h:160-163 / comm.py:173-188 split_communicator).

    Returns the list of sub-meshes in rank order; collectives inside a
    sub-mesh only involve its devices.
    """
    devs = list(mesh.devices.reshape(-1))
    assert len(devs) % group_size == 0, (len(devs), group_size)
    return [
        Mesh(np.asarray(devs[i:i + group_size]), (axis,))
        for i in range(0, len(devs), group_size)
    ]
