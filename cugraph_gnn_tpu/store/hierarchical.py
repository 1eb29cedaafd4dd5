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


def _bucket_by_key(ids, keys, nbuckets: int):
    """Sort ids by an owner key in [0, nbuckets); -1 ids ride the last
    bucket.  Returns (sorted_ids, perm, counts, offsets)."""
    keys = jnp.where(ids >= 0, jnp.clip(keys, 0, nbuckets - 1),
                     nbuckets - 1)
    perm = jnp.argsort(keys, stable=True)
    counts = jnp.bincount(keys, length=nbuckets)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    return ids[perm], perm, counts, offsets


def _hier_gather_shard(table, ids, *, book: PartitionBook, node_axis: str,
                       dev_axis: str, world_dev: int, fill):
    """Per-shard two-phase gather on the (node, device) mesh — the
    reference's MT_HIERARCHY pipeline mapped to mesh axes
    (ref gather_op_impl_hierarchy.cu:23-105):

    A. **ICI** all-to-all over the device axis, bucketing each device's
       locally-deduped ids by the owner's *device column* — then a
       node-level dedup: ids queried by several sibling devices merge
       into one request (the reference's sort_unique across the clique).
    B. **DCN** all-to-all over the node axis only, bucketing by owner
       node.  Every unique (node, id) request crosses DCN exactly once.
    C. Rows flow back through the reverse geometry: node axis, expand
       the node-level dedup, device axis, expand the local dedup.
    """
    b = ids.shape[0]
    d = world_dev
    n_nodes = book.world_size // d
    fillv = jnp.asarray(fill)

    # Phase 0: local dedup before any wire.
    uniq, inv = _dedup_static(ids, b)
    owner = book.owner_of(jnp.maximum(uniq, 0))

    # Phase A (ICI): route to the owner's device column within my node.
    a_ids, a_perm, a_counts, a_offsets = _bucket_by_key(
        uniq, owner % d, d)
    recvA, a_recv_sizes, a_recv_offsets = _ragged_a2a(
        a_ids, a_offsets, a_counts, dev_axis, d * b)
    posA = jnp.arange(d * b)
    recvA = jnp.where(posA < jnp.sum(a_recv_sizes), recvA, -1)
    # Node-level dedup: sibling devices' duplicate requests merge here.
    uniq2, inv2 = _dedup_static(recvA, d * b)
    owner2 = book.owner_of(jnp.maximum(uniq2, 0))

    # Phase B (DCN): route to the owner node; my device column is
    # already the owner's column, so the receiver owns every id it gets.
    b_ids, b_perm, b_counts, b_offsets = _bucket_by_key(
        uniq2, owner2 // d, n_nodes)
    recvB, b_recv_sizes, b_recv_offsets = _ragged_a2a(
        b_ids, b_offsets, b_counts, node_axis, n_nodes * d * b)
    # DCN id volume: valid ids sent to OTHER nodes (test observability).
    my_node = jax.lax.axis_index(node_axis)
    valid_counts = jnp.bincount(
        jnp.where(uniq2 >= 0, jnp.clip(owner2 // d, 0, n_nodes - 1),
                  n_nodes), length=n_nodes + 1)[:n_nodes]
    dcn_sent = (jnp.sum(valid_counts)
                - valid_counts[my_node])[None]

    # Local gather at the owner (rank = node * d + my column).
    my_rank = my_node * d + jax.lax.axis_index(dev_axis)
    # node counts fit int32; explicit cast avoids the silent int64
    # truncation warning with x64 off
    row_start = jnp.take(
        jnp.asarray(np.asarray(book.offsets[:-1]).astype(np.int32)),
        my_rank)
    my_count = jnp.take(
        jnp.asarray(np.asarray(book.counts).astype(np.int32)), my_rank)
    local = recvB - row_start
    ok = (recvB >= 0) & (local >= 0) & (local < my_count)
    rows = table[jnp.where(ok, local, 0)]
    rows = jnp.where(ok[:, None], rows, fillv.astype(rows.dtype))

    # Phase C: reverse node axis -> expand node dedup -> reverse device
    # axis -> expand local dedup.
    backB = alltoallv(rows, b_recv_offsets, b_recv_sizes, b_offsets,
                      b_counts, node_axis, d * b)
    inv_permB = jnp.zeros_like(b_perm).at[b_perm].set(jnp.arange(d * b))
    uniq2_rows = backB[inv_permB]
    rowsA = jnp.where((inv2 >= 0)[:, None],
                      uniq2_rows[jnp.clip(inv2, 0)],
                      fillv.astype(uniq2_rows.dtype))
    backA = alltoallv(rowsA, a_recv_offsets, a_recv_sizes, a_offsets,
                      a_counts, dev_axis, b)
    inv_permA = jnp.zeros_like(a_perm).at[a_perm].set(jnp.arange(b))
    uniq_rows = backA[inv_permA]
    out = uniq_rows[jnp.clip(inv, 0)]
    return (jnp.where((inv >= 0)[:, None], out,
                      fillv.astype(out.dtype)), dcn_sent)


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
        return self.gather_with_stats(ids, fill=fill)[0]

    def gather_with_stats(self, ids, fill=0):
        """Gather plus per-device DCN id volume: ``stats[r]`` counts the
        deduplicated ids device ``r`` shipped to *other* nodes over the
        node (DCN) axis — the quantity the two-phase design minimises
        (ref gather_op_impl_hierarchy.cu's cross-node alltoallv)."""
        f = functools.partial(
            _hier_gather_shard, book=self.book, node_axis=self.node_axis,
            dev_axis=self.dev_axis, world_dev=self.mesh.shape[self.dev_axis],
            fill=fill)
        spec = P((self.node_axis, self.dev_axis))
        shard = jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec))
        return shard(self.data, ids)

    def to_global(self):
        data = np.asarray(self.data)
        return data[: self.book.total]
