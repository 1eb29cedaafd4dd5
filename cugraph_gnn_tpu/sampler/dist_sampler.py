"""Distributed sampling over a row-sharded graph (multi-chip/multi-host).

TPU-native replacement for the reference's sampling over MT_DISTRIBUTED
memory (ref cpp/src/wholegraph_ops/unweighted_sample_without_replacement_nccl_func.cuh:226-377:
NCCL-gather remote row extents, sample positions, NCCL-gather chosen
columns) and for the bulk-synchronous multi-rank sampling of external
libcugraph (SURVEY.md §2.4 graph partition parallelism).

Design: the CSR is partitioned by *row* (destination node) across the
mesh axis — each shard owns rows [r*rows_per_shard, (r+1)*rows_per_shard)
with a rebased local indptr and its slice of the column array (global
ids).  A sampling step routes seed ids to their owner shard (same
bucket -> ragged all-to-all machinery as the feature gather), samples
locally (fused Floyd kernel, zero remote row reads — better than the
reference's two-round remote extent+column gather), and routes the
fixed-fanout result blocks back.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.sampler.output import HopBlock, MultihopBatch
from cugraph_gnn_tpu.store.dist_array import (
    _bucket_by_owner,
    _ragged_a2a,
    alltoallv,
)
from cugraph_gnn_tpu.store.partition import PartitionBook


class DistGraph(NamedTuple):
    """Row-sharded CSR on a mesh.

    indptr: (W * (rows_per_shard+1),) sharded over axis — shard r holds
      its rebased indptr (0-based into its indices slice).
    indices: (W * max_edges_per_shard,) sharded — global column ids,
      -1 padded per shard.
    edge_base: (W,) replicated — global edge-id offset of each shard.
    book: row partition book.  mesh/axis: placement.
    """

    indptr: jax.Array
    indices: jax.Array
    edge_base: jax.Array
    book: PartitionBook
    mesh: Mesh
    axis: str

    @property
    def rows_per_shard(self) -> int:
        return self.book.shard_size

    @staticmethod
    def from_global_csr(indptr, indices, mesh: Mesh,
                        axis: str = STORE_AXIS) -> "DistGraph":
        """Partition a host CSR row-wise onto the mesh."""
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        n = len(indptr) - 1
        w = mesh.shape[axis]
        book = PartitionBook.even(n, w)
        rps = book.shard_size
        max_edges = 1
        shard_ip = np.zeros((w, rps + 1), np.int32)
        bases = np.zeros((w,), np.int64)
        slices = []
        for r in range(w):
            lo, hi = int(book.offsets[r]), int(book.offsets[r + 1])
            ip = indptr[lo:hi + 1] - indptr[lo]
            shard_ip[r, : hi - lo + 1] = ip
            shard_ip[r, hi - lo + 1:] = ip[-1] if len(ip) else 0
            sl = indices[indptr[lo]:indptr[hi]]
            slices.append(sl)
            bases[r] = indptr[lo]
            max_edges = max(max_edges, len(sl))
        shard_ix = np.full((w, max_edges), -1, np.int32)
        for r, sl in enumerate(slices):
            shard_ix[r, : len(sl)] = sl
        sh = NamedSharding(mesh, P(axis))
        return DistGraph(
            indptr=jax.device_put(shard_ip.reshape(-1), sh),
            indices=jax.device_put(shard_ix.reshape(-1), sh),
            edge_base=jax.device_put(bases, NamedSharding(mesh, P())),
            book=book, mesh=mesh, axis=axis)


def _one_hop_shard(indptr, indices, edge_base, key, seeds, *, fanout: int,
                   book: PartitionBook, axis: str):
    """Per-shard body: route seeds to owners, sample locally, route back.

    indptr: (rows_per_shard+1,) local.  indices: (max_edges,) local.
    seeds: (B,) local query seeds (global ids, -1 pad).
    Returns (neighbors (B,k), edge_ids (B,k), num_sampled (B,)).
    """
    b = seeds.shape[0]
    world = book.world_size
    seeds = seeds.astype(jnp.int32)
    sorted_ids, perm, counts, offsets = _bucket_by_owner(seeds, book)
    req_ids, recv_sizes, recv_offsets = _ragged_a2a(
        sorted_ids, offsets, counts, axis, world * b)
    # local sample on the owner (requests beyond recv total are stale:
    # mask them as invalid seeds)
    my_rank = jax.lax.axis_index(axis)
    row_start = jnp.asarray(book.offsets[:-1])[my_rank]
    my_count = jnp.asarray(book.counts)[my_rank]
    local = req_ids - row_start
    pos = jnp.arange(world * b)
    ok = (pos < jnp.sum(recv_sizes)) & (req_ids >= 0) & (local >= 0) & (
        local < my_count)
    safe_local = jnp.where(ok, local, 0)
    skey = jax.random.fold_in(key, my_rank)
    out = sample_ops.uniform_sample(skey, indptr, indices, safe_local, fanout)
    okm = ok[:, None]
    neighbors = jnp.where(okm, out.neighbors, -1)
    base = edge_base[my_rank].astype(jnp.int32)
    edge_ids = jnp.where(okm & (out.edge_ids >= 0), out.edge_ids + base, -1)
    # route the (k,)-blocks back to the requester
    back_n = alltoallv(neighbors, recv_offsets, recv_sizes, offsets, counts,
                       axis, b)
    back_e = alltoallv(edge_ids, recv_offsets, recv_sizes, offsets, counts,
                       axis, b)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(b))
    back_n = back_n[inv]
    back_e = back_e[inv]
    return back_n, back_e, jnp.sum(back_n >= 0, axis=1).astype(jnp.int32)


class DistNeighborSampler:
    """Multi-hop uniform sampling over a DistGraph; per-rank seed shards,
    static shapes, dedup=False layout (static renumbering — the sorts a
    per-rank dedup would need are the TPU bottleneck; duplicates across
    hops only cost a few percent extra gather)."""

    def __init__(self, graph: DistGraph, fanouts: Sequence[int]):
        self.graph = graph
        self.fanouts = tuple(int(f) for f in fanouts)

    def sample_shard_fn(self, local_batch: int):
        """Returns the per-shard multihop function for use inside an
        enclosing shard_map (composable with gather/compute)."""
        g = self.graph
        fanouts = self.fanouts

        def fn(indptr, indices, edge_base, key, seeds):
            def gcount(x):  # globally-replicated count across shards
                return jax.lax.psum(
                    jnp.sum(x >= 0).astype(jnp.int32), g.axis)

            levels = [seeds.astype(jnp.int32)]
            level_counts = [gcount(seeds)]
            hops: List[HopBlock] = []
            for h, fanout in enumerate(fanouts):
                targets = levels[-1]
                t = targets.shape[0]
                hkey = jax.random.fold_in(key, h)
                nbrs, eids, _ = _one_hop_shard(
                    indptr, indices, edge_base, hkey, targets,
                    fanout=fanout, book=g.book, axis=g.axis)
                pos = (t + jnp.arange(t * fanout, dtype=jnp.int32)
                       ).reshape(nbrs.shape)
                neigh_local = jnp.where(nbrs >= 0, pos, -1)
                hops.append(HopBlock(neigh_local=neigh_local,
                                     neigh_global=nbrs, edge_ids=eids))
                levels.append(jnp.concatenate([targets, nbrs.reshape(-1)]))
                level_counts.append(gcount(levels[-1]))
            return MultihopBatch(levels=levels, level_counts=level_counts,
                                 hops=hops, seed_count=level_counts[0])

        return fn

    def sample(self, key, seeds):
        """Standalone sampling: seeds sharded over the mesh axis; returns
        a MultihopBatch of sharded arrays."""
        g = self.graph
        fn = self.sample_shard_fn(seeds.shape[0] // g.book.world_size)
        shard = jax.shard_map(
            fn, mesh=g.mesh,
            in_specs=(P(g.axis), P(g.axis), P(), P(), P(g.axis)),
            out_specs=MultihopBatch(
                levels=[P(g.axis)] * (len(self.fanouts) + 1),
                level_counts=[P()] * (len(self.fanouts) + 1),
                hops=[HopBlock(P(g.axis), P(g.axis), P(g.axis))
                      for _ in self.fanouts],
                seed_count=P()),
        )
        return shard(g.indptr, g.indices, g.edge_base, key, seeds)
