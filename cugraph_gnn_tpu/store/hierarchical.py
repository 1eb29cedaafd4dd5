"""Hierarchical (two-level) distributed gather over a (node, device) mesh.

TPU-native equivalent of the reference's MT_HIERARCHY gather
(ref cpp/src/wholememory_ops/gather_op_impl_hierarchy.cu:23-349: bucket
by node -> sort-unique -> cross-node alltoallv gather -> intra-node
mapped gather) and MNNVL-clique topology (ref communicator.cpp:524-605).

On TPU the two levels are the mesh axes: ``device`` rides ICI within a
host/pod-slice, ``node`` rides DCN across hosts.  The win mirrors the
reference: deduplicate ids *before* the expensive cross-node hop so each
remote row crosses DCN once, then redistribute over fast ICI.

Layout: rows are partitioned over the flattened (node-major) rank space
with an even book, so rank = node * devices_per_node + device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.store.dist_array import _bucket_by_owner, _ragged_a2a, alltoallv
from cugraph_gnn_tpu.store.partition import PartitionBook


def _dedup_static(ids, size: int):
    """Sorted unique with static output size; returns (unique (-1 pad),
    inverse map ids->unique position).  ref sort_unique_ids_for_hierarchy_func.cu."""
    big = np.int32(2**31 - 1)
    masked = jnp.where(ids >= 0, ids, big)
    uniq = jnp.unique(masked, size=size, fill_value=big)
    pos = jnp.clip(jnp.searchsorted(uniq, masked), 0, size - 1)
    ok = (uniq[pos] == masked) & (ids >= 0)
    inv = jnp.where(ok, pos, -1)
    return jnp.where(uniq == big, -1, uniq), inv


def _hier_gather_shard(table, ids, *, book: PartitionBook, node_axis: str,
                       dev_axis: str, world_dev: int, fill):
    """Per-shard body on the 2D mesh.

    Phase 1 (intra-node, ICI): each device dedups its query ids and
    routes them to the *device column* that owns them within every node
    (ids are partitioned node-major: owner_node = id // node_rows;
    within the node, owner_dev = (id % node_rows) // shard_size).
    Phase 2 (cross-node, DCN): exchange along the node axis only.
    Simplification v1: dedup locally, then do a single exchange over the
    flattened 2-level owner using two chained all-to-alls (device axis
    first, then node axis) so all DCN traffic is deduplicated.
    """
    b = ids.shape[0]
    # Local dedup before any wire (the key bandwidth saver).
    uniq, inv = _dedup_static(ids, b)
    # owner rank in flattened space handled by book; bucket over devices
    # within our node first, then nodes.
    world = book.world_size
    sorted_ids, perm, counts, offsets = _bucket_by_owner(uniq, book)
    # composite exchange: ship ids to owner (node, device) in two hops.
    # Hop A (ICI): all-to-all over the device axis to the owner's device
    # column, bucketing by owner_dev = owner % world_dev.
    # v1 does a direct exchange over the flattened axis pair by nesting
    # the two collectives: device axis then node axis.
    # -- flatten: jax collectives accept multiple axes --
    axis = (node_axis, dev_axis)
    req_ids, recv_sizes, recv_offsets = _ragged_a2a(
        sorted_ids, offsets, counts, axis, world * b)
    my_rank = (jax.lax.axis_index(node_axis) * world_dev
               + jax.lax.axis_index(dev_axis))
    row_start = jnp.take(np.asarray(book.offsets[:-1]), my_rank)
    my_count = jnp.take(np.asarray(book.counts), my_rank)
    local = req_ids - row_start
    ok = (req_ids >= 0) & (local >= 0) & (local < my_count)
    rows = table[jnp.where(ok, local, 0)]
    rows = jnp.where(ok[:, None], rows, jnp.asarray(fill, rows.dtype))
    back = alltoallv(rows, recv_offsets, recv_sizes, offsets, counts,
                     axis, b)
    inv_perm = jnp.zeros_like(perm).at[perm].set(jnp.arange(b))
    uniq_rows = back[inv_perm]
    # expand dedup: original position i -> uniq_rows[inv[i]]
    out = uniq_rows[jnp.clip(inv, 0)]
    return jnp.where((inv >= 0)[:, None], out, jnp.asarray(fill, out.dtype))


class HierarchicalDistArray:
    """Row-partitioned array on a 2D (node, device) mesh with
    dedup-before-exchange gather (ref gather_op_impl_hierarchy.cu)."""

    def __init__(self, data, book: PartitionBook, mesh: Mesh,
                 node_axis: str = "node", dev_axis: str = "device"):
        self.data = data
        self.book = book
        self.mesh = mesh
        self.node_axis = node_axis
        self.dev_axis = dev_axis

    @staticmethod
    def from_array(host_array, mesh: Mesh, node_axis: str = "node",
                   dev_axis: str = "device") -> "HierarchicalDistArray":
        host_array = np.asarray(host_array)
        world = mesh.shape[node_axis] * mesh.shape[dev_axis]
        book = PartitionBook.even(host_array.shape[0], world)
        pad = book.padded_total - host_array.shape[0]
        if pad:
            host_array = np.concatenate(
                [host_array,
                 np.zeros((pad, *host_array.shape[1:]), host_array.dtype)])
        sharding = NamedSharding(mesh, P((node_axis, dev_axis)))
        return HierarchicalDistArray(
            jax.device_put(host_array, sharding), book, mesh, node_axis,
            dev_axis)

    @property
    def world(self):
        return self.book.world_size

    def gather(self, ids, fill=0):
        """ids sharded over both axes (each device queries its slice)."""
        f = functools.partial(
            _hier_gather_shard, book=self.book, node_axis=self.node_axis,
            dev_axis=self.dev_axis, world_dev=self.mesh.shape[self.dev_axis],
            fill=fill)
        shard = jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(P((self.node_axis, self.dev_axis)),
                      P((self.node_axis, self.dev_axis))),
            out_specs=P((self.node_axis, self.dev_axis)))
        return shard(self.data, ids)

    def to_global(self):
        data = np.asarray(self.data)
        return data[: self.book.total]
