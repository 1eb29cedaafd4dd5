"""Distributed sampling over a row-sharded graph (multi-chip/multi-host).

TPU-native replacement for the reference's sampling over MT_DISTRIBUTED
memory (ref cpp/src/wholegraph_ops/unweighted_sample_without_replacement_nccl_func.cuh:226-377:
NCCL-gather remote row extents, sample positions, NCCL-gather chosen
columns) and for the multi-rank variant dispatch of
cugraph_pyg/sampler/distributed_sampler.py:53-94 (uniform / biased /
temporal x dedup on/off).

Design: the CSR is partitioned by *row* (destination node) across the
mesh axis — each shard owns rows [r*rows_per_shard, (r+1)*rows_per_shard)
with a rebased local indptr and its slice of the column array (global
ids).  A sampling step routes seed ids (and seed times, for temporal
variants) to their owner shard (same bucket -> ragged all-to-all
machinery as the feature gather), samples locally (fused Floyd / Gumbel
top-k kernels riding the line-window gather, zero remote row reads —
better than the reference's two-round remote extent+column gather), and
routes the fixed-fanout result blocks back.

Frontier dedup (``dedup=True``) runs per shard between hops — the
analog of the reference's per-rank ``deduplicate_sources`` — so a node
reached twice on one shard is sampled once and its features are
requested once in the subsequent distributed gather.  Note on overlap:
XLA:TPU executes thunks serially within a program, so hop-(l+1)
sampling cannot overlap hop-l feature exchange inside one jit; the
dedup (bandwidth) is where the win is on this stack.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.ops.unique import append_unique
from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.sampler.neighbor_sampler import level_capacities
from cugraph_gnn_tpu.sampler.output import HopBlock, MultihopBatch
from cugraph_gnn_tpu.store.dist_array import (
    _bucket_by_owner,
    _ragged_a2a,
    alltoallv,
    mesh_axis_size,
    put_global,
)
from cugraph_gnn_tpu.store.partition import PartitionBook

_LINE = 128  # 512B HBM line, 4-byte elements (ops/window_gather.py)


class DistGraph(NamedTuple):
    """Row-sharded CSR on a mesh.

    indptr: (W * (rows_per_shard+1),) sharded over axis — shard r holds
      its rebased indptr (0-based into its indices slice).
    indices: (W * max_edges_per_shard,) sharded — global column ids,
      -1 padded per shard; per-shard slice length is a 128 multiple so
      samplers can ride the line-window gather.
    edge_base: replicated global edge-id offset of each shard —
      (W,) int32 when the graph's edge-id space fits int32
      (edge_id_bits == 32), else (W, 2) int32 [hi, lo] planes of the
      int64 bases (ops/edge_ids.py; lo modulus 2**30).
    weights / times: optional per-edge arrays sharded like ``indices``
      (biased / temporal sampling variants).
    max_degree: static global degree bound (chunked top-k trip count).
    book: row partition book (default: edge-balanced — each shard holds
      ~equal edges, so the padded per-shard edge buffer is ~E/W instead
      of the max-degree-skewed even-row split).  mesh/axis: placement.
    edge_id_bits: 32 (packed int32 global edge ids, the fast common
      case) or 64 (sampled edge ids come back as (hi, lo) int32 planes;
      ref int64-id sampling, wholegraph_op.h:31-54).
    """

    indptr: jax.Array
    indices: jax.Array
    edge_base: jax.Array
    book: PartitionBook
    mesh: Mesh
    axis: str
    weights: Optional[jax.Array] = None
    times: Optional[jax.Array] = None
    max_degree: Optional[int] = None
    edge_id_bits: int = 32

    @property
    def rows_per_shard(self) -> int:
        return self.book.shard_size

    @staticmethod
    def from_global_csr(indptr, indices, mesh: Mesh,
                        axis: str = STORE_AXIS, weights=None,
                        times=None, book: Optional[PartitionBook] = None,
                        edge_id_bits: Optional[int] = None
                        ) -> "DistGraph":
        """Partition a host CSR row-wise onto the mesh.  ``weights`` /
        ``times`` are optional per-edge arrays in global CSR edge order
        (enable the biased / temporal sampling variants).  ``book``
        overrides the default edge-balanced row partition."""
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        n = len(indptr) - 1
        w = mesh_axis_size(mesh, axis)
        if book is None:
            book = PartitionBook.edge_balanced(indptr, w)
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
            sl = slice(int(indptr[lo]), int(indptr[hi]))
            slices.append(sl)
            bases[r] = indptr[lo]
            max_edges = max(max_edges, sl.stop - sl.start)
        # per-shard edge slices padded to a 512B-line multiple for the
        # window gather
        max_edges = -(-max_edges // _LINE) * _LINE
        shard_ix = np.full((w, max_edges), -1, np.int32)
        for r, sl in enumerate(slices):
            shard_ix[r, : sl.stop - sl.start] = indices[sl]

        def shard_edge_attr(attr, sh):
            if attr is None:
                return None
            attr = np.asarray(attr)
            out = np.zeros((w, max_edges), attr.dtype)
            for r, sl in enumerate(slices):
                out[r, : sl.stop - sl.start] = attr[sl]
            return put_global(out.reshape(-1), sh)

        deg = indptr[1:] - indptr[:-1]
        return _assemble_dist_graph(
            shard_ip, shard_ix, bases, int(indptr[-1]),
            int(deg.max(initial=0)), book, mesh, axis,
            weights=weights, times=times, shard_edge_attr=shard_edge_attr,
            edge_id_bits=edge_id_bits)

    @staticmethod
    def from_shard_files(edge_files, num_nodes: int, mesh: Mesh,
                         axis: str = STORE_AXIS, weights_files=None,
                         times_files=None,
                         book: Optional[PartitionBook] = None,
                         edges_per_shard=None,
                         edge_id_bits: Optional[int] = None) -> "DistGraph":
        """Out-of-core construction from per-rank COO edge files —
        the global graph is never materialised on any one host
        (ref data/graph_store.py:135-208 builds from rank-local COO
        shards with allgathered sizes; file_io.cpp:91-872 loads rank
        partitions from filelists).

        edge_files: list of .npy paths, each an (E_k, 2) int array of
        [src, dst] rows (any dtype up to int64).  The concatenation of
        the files in order is the logical COO — identical sampled
        batches to ``from_global_csr`` on that COO's CSR (same book).
        Files are mmap'd and streamed one at a time; per-shard CSRs are
        built by stable bucketing (within-row edge order == global COO
        order, so edge ids match the global build bit-exactly).

        weights_files / times_files: optional per-edge attribute .npy
        files aligned row-for-row with edge_files.

        book: row partition; default edge-balanced, which needs the
        per-row degree histogram — computed in one streaming pass.
        edges_per_shard: optional precomputed static per-shard edge
        capacity (skips a sizing pass).
        """
        if isinstance(edge_files, (str, bytes)):
            edge_files = [edge_files]
        edge_files = list(edge_files)
        w = mesh_axis_size(mesh, axis)
        n = int(num_nodes)

        def open_edges(k):
            return np.load(edge_files[k], mmap_mode="r")

        if book is None:
            # pass 1: degree histogram (rows = dst, reversed CSR like
            # SamplingGraph) -> edge-balanced cuts
            deg = np.zeros(n + 1, np.int64)
            for k in range(len(edge_files)):
                dst = np.asarray(open_edges(k)[:, 1], np.int64)
                np.add.at(deg, dst + 1, 1)
            indptr_global = np.cumsum(deg)
            book = PartitionBook.edge_balanced(indptr_global, w)

        # pass 2: per-shard local CSR by stable bucketing.  Build each
        # shard's degree counts first, then fill a second streaming pass
        # (two passes over mmap'd files, O(shard) memory each).
        starts = book.offsets[:-1]
        shard_deg = [np.zeros(int(book.counts[r]) + 1, np.int64)
                     for r in range(w)]
        for k in range(len(edge_files)):
            dst = np.asarray(open_edges(k)[:, 1], np.int64)
            owner = book.owner_of_np(dst)
            for r in range(w):
                sel = dst[owner == r] - starts[r]
                np.add.at(shard_deg[r], sel + 1, 1)
        local_ip = [np.cumsum(d) for d in shard_deg]
        counts_e = np.asarray([int(ip[-1]) for ip in local_ip], np.int64)
        bases = np.concatenate([[0], np.cumsum(counts_e)[:-1]])
        max_edges = int(counts_e.max(initial=1))
        if edges_per_shard is not None:
            max_edges = max(max_edges, int(edges_per_shard))
        max_edges = max(-(-max_edges // _LINE) * _LINE, _LINE)

        rps = book.shard_size
        shard_ip = np.zeros((w, rps + 1), np.int32)
        for r in range(w):
            ip = local_ip[r]
            shard_ip[r, : len(ip)] = ip
            shard_ip[r, len(ip):] = ip[-1]
        shard_ix = np.full((w, max_edges), -1, np.int32)
        has_w = weights_files is not None
        has_t = times_files is not None
        shard_w = (np.zeros((w, max_edges),
                            np.load(weights_files[0], mmap_mode="r").dtype)
                   if has_w else None)
        shard_t = (np.zeros((w, max_edges),
                            np.load(times_files[0], mmap_mode="r").dtype)
                   if has_t else None)
        cursor = [ip[:-1].copy() for ip in local_ip]  # next free slot/row
        max_deg = 0
        for k in range(len(edge_files)):
            e = open_edges(k)
            src = np.asarray(e[:, 0], np.int64)
            dst = np.asarray(e[:, 1], np.int64)
            wv = np.asarray(np.load(weights_files[k], mmap_mode="r")) \
                if has_w else None
            tv = np.asarray(np.load(times_files[k], mmap_mode="r")) \
                if has_t else None
            owner = book.owner_of_np(dst)
            for r in range(w):
                sel = np.flatnonzero(owner == r)
                if not len(sel):
                    continue
                rows = dst[sel] - starts[r]
                # stable within-row fill: np.add.at-style cursor bump.
                # groupby via argsort(stable) keeps file order per row.
                order = np.argsort(rows, kind="stable")
                rows_s = rows[order]
                pos = cursor[r][rows_s]
                # within-run offsets: occurrence index of each row
                run_start = np.r_[0, np.flatnonzero(np.diff(rows_s)) + 1]
                occ = np.arange(len(rows_s)) - np.repeat(
                    run_start, np.diff(np.r_[run_start, len(rows_s)]))
                slot = pos + occ
                shard_ix[r, slot] = src[sel][order]
                if has_w:
                    shard_w[r, slot] = wv[sel][order]
                if has_t:
                    shard_t[r, slot] = tv[sel][order]
                np.add.at(cursor[r], rows_s[run_start],
                          np.diff(np.r_[run_start, len(rows_s)]))
            del e
        for r in range(w):
            d = shard_deg[r][1:]
            if len(d):
                max_deg = max(max_deg, int(d.max(initial=0)))

        def shard_edge_attr(attr, sh):
            if attr is None:
                return None
            return put_global(attr.reshape(-1), sh)

        return _assemble_dist_graph(
            shard_ip, shard_ix, bases, int(counts_e.sum()), max_deg,
            book, mesh, axis, weights=shard_w, times=shard_t,
            shard_edge_attr=shard_edge_attr, edge_id_bits=edge_id_bits)


    @staticmethod
    def from_local_coo(src, dst, num_nodes: int, mesh: Mesh,
                       axis: str = STORE_AXIS, weights=None, times=None,
                       book: Optional[PartitionBook] = None,
                       chunk: int = 1 << 18,
                       edge_id_bits: Optional[int] = None) -> "DistGraph":
        """Build the row-sharded graph from RANK-LOCAL COO shards:
        every process passes only its own (different) edge slice; no
        process ever materialises the global COO (ref
        graph_store.py:135-208 rank-local put + allgathered sizes).

        The logical global COO is the per-shard concatenation in shard
        order (single-process: just the given arrays) — sampled batches
        match ``from_global_csr`` of that COO's CSR bit-exactly.  Edges
        are routed to their dst-owner shards with the chunked device
        all-to-all in store/edge_exchange.py; each process then builds
        only its shards' CSRs.
        """
        from jax.experimental import multihost_utils

        from cugraph_gnn_tpu.store.edge_exchange import route_local_edges

        vals = {}
        if weights is not None:
            vals["w"] = np.asarray(weights)
        if times is not None:
            vals["t"] = np.asarray(times)
        book, shards = route_local_edges(
            src, dst, num_nodes, mesh, axis, vals=vals or None,
            book=book, chunk=chunk)
        w = book.world_size
        nproc = max(jax.process_count(), 1)
        rps = book.shard_size
        starts = book.offsets[:-1]

        # per-addressable-shard CSR (stable counting sort keeps the
        # within-row global-COO order)
        local = {}
        my_max_deg = 0
        for r, ed in shards.items():
            rows = ed["dst"] - starts[r]
            nrows = int(book.counts[r])
            order = np.argsort(rows, kind="stable")
            cnt = np.bincount(rows, minlength=nrows)
            ip = np.zeros(rps + 1, np.int32)
            ip[1: nrows + 1] = np.cumsum(cnt)
            ip[nrows + 1:] = ip[nrows]
            entry = {"indptr": ip,
                     "indices": ed["src"][order].astype(np.int32)}
            for nm in ("w", "t"):
                if nm in ed:
                    entry[nm] = ed[nm][order]
            local[r] = entry
            if nrows:
                my_max_deg = max(my_max_deg, int(cnt.max(initial=0)))

        # allgather per-shard edge counts (for bases + buffer sizing)
        # and the degree bound — small metadata exchange, like the
        # reference's allgathered sizes
        my_counts = np.zeros(w, np.int64)
        for r, ed in shards.items():
            my_counts[r] = len(ed["dst"])
        if nproc > 1:
            gathered = np.asarray(multihost_utils.process_allgather(
                np.concatenate([my_counts,
                                [my_max_deg]]).astype(np.float64)))
            counts_e = gathered[:, :w].sum(axis=0).astype(np.int64)
            max_deg = int(gathered[:, w].max())
        else:
            counts_e = my_counts
            max_deg = my_max_deg
        bases = np.concatenate([[0], np.cumsum(counts_e)[:-1]])
        max_edges = max(int(counts_e.max(initial=1)), 1)
        max_edges = -(-max_edges // _LINE) * _LINE

        sh = NamedSharding(mesh, P(axis))

        def filler(key_name, dtype, fill_value):
            def fill(index):
                r = (index[0].start or 0) // max_edges
                out = np.full((max_edges,), fill_value, dtype)
                v = local[r].get(key_name)
                if v is not None and len(v):
                    out[: len(v)] = v
                return out
            return fill

        def fill_ip(index):
            r = (index[0].start or 0) // (rps + 1)
            return local[r]["indptr"]

        indptr_arr = jax.make_array_from_callback(
            (w * (rps + 1),), sh, fill_ip)
        indices_arr = jax.make_array_from_callback(
            (w * max_edges,), sh, filler("indices", np.int32, -1))
        w_arr = t_arr = None
        if weights is not None:
            w_arr = jax.make_array_from_callback(
                (w * max_edges,), sh,
                filler("w", np.asarray(weights).dtype, 0))
        if times is not None:
            t_arr = jax.make_array_from_callback(
                (w * max_edges,), sh,
                filler("t", np.asarray(times).dtype, 0))

        total_edges = int(counts_e.sum())
        if edge_id_bits is None:
            edge_id_bits = 32 if total_edges < 2**31 - 1 else 64
        if edge_id_bits == 32:
            if total_edges >= 2**31 - 1:
                raise ValueError(
                    f"{total_edges} edges do not fit 32-bit edge ids")
            eb = put_global(bases.astype(np.int32),
                            NamedSharding(mesh, P()))
        else:
            from cugraph_gnn_tpu.ops.edge_ids import (
                MAX_LOCAL_EDGES,
                split_bases_np,
            )
            if max_edges >= MAX_LOCAL_EDGES:
                raise ValueError(
                    f"a single shard holds {max_edges} edges >= 2**30; "
                    "use more shards")
            eb = put_global(split_bases_np(bases),
                            NamedSharding(mesh, P()))
        return DistGraph(
            indptr=indptr_arr, indices=indices_arr, edge_base=eb,
            book=book, mesh=mesh, axis=axis, weights=w_arr, times=t_arr,
            max_degree=max_deg, edge_id_bits=edge_id_bits)


def _assemble_dist_graph(shard_ip, shard_ix, bases, total_edges: int,
                         max_deg: int, book: PartitionBook, mesh: Mesh,
                         axis: str, *, weights, times, shard_edge_attr,
                         edge_id_bits: Optional[int] = None):
    """Shared tail of the DistGraph constructors: pick the edge-id
    width, split int64 bases when needed, device-put the shards."""
    from cugraph_gnn_tpu.ops.edge_ids import (
        MAX_LOCAL_EDGES,
        split_bases_np,
    )
    w = book.world_size
    sh = NamedSharding(mesh, P(axis))
    per_shard = shard_ix.shape[1]
    if edge_id_bits is None:
        edge_id_bits = 32 if total_edges < 2**31 - 1 else 64
    if edge_id_bits == 32:
        if total_edges >= 2**31 - 1:
            raise ValueError(
                f"{total_edges} edges do not fit 32-bit edge ids")
        eb = put_global(bases.astype(np.int32), NamedSharding(mesh, P()))
    else:
        if per_shard >= MAX_LOCAL_EDGES:
            raise ValueError(
                f"a single shard holds {per_shard} edges >= 2**30 "
                f"(a >=4GB indices buffer); use more shards "
                f"(world={w}) so each stays under the local limit")
        eb = put_global(split_bases_np(bases), NamedSharding(mesh, P()))
    return DistGraph(
        indptr=put_global(shard_ip.reshape(-1), sh),
        indices=put_global(shard_ix.reshape(-1), sh),
        edge_base=eb, book=book, mesh=mesh, axis=axis,
        weights=shard_edge_attr(weights, sh),
        times=shard_edge_attr(times, sh),
        max_degree=max_deg, edge_id_bits=edge_id_bits)


def _one_hop_shard(indptr, indices, edge_base, key, seeds, *, fanout: int,
                   book: PartitionBook, axis: str, weights=None, times=None,
                   seed_time=None, max_degree: Optional[int] = None,
                   edge_id_bits: int = 32):
    """Per-shard body: route seeds (and their times) to owners, sample
    locally with the matching variant kernel, route back.

    indptr: (rows_per_shard+1,) local.  indices: (max_edges,) local,
    128-multiple length.  seeds: (B,) local query seeds (global ids,
    -1 pad).  seed_time: (B,) local per-seed times (temporal variants).
    Returns (neighbors (B,k), edge_ids (B,k), edge_hi (B,k) | None,
    num_sampled (B,)); edge_hi carries the high int32 plane of the
    64-bit global edge ids when edge_id_bits == 64 (ops/edge_ids.py).
    """
    b = seeds.shape[0]
    world = book.world_size
    seeds = seeds.astype(jnp.int32)
    sorted_ids, perm, counts, offsets = _bucket_by_owner(seeds, book)
    req_ids, recv_sizes, recv_offsets = _ragged_a2a(
        sorted_ids, offsets, counts, axis, world * b)
    req_time = None
    if seed_time is not None:
        # seed times ride the same geometry as the ids
        req_time, _, _ = _ragged_a2a(
            seed_time[perm], offsets, counts, axis, world * b)
    # local sample on the owner (requests beyond recv total are stale:
    # mask them as invalid seeds).  Books keep int64 offsets on host;
    # node counts fit int32, so cast explicitly (jnp.asarray of an
    # int64 array would warn-and-truncate with x64 off).
    my_rank = jax.lax.axis_index(axis)
    row_start = jnp.asarray(book.offsets[:-1].astype(np.int32))[my_rank]
    my_count = jnp.asarray(book.counts.astype(np.int32))[my_rank]
    local = req_ids - row_start
    pos = jnp.arange(world * b)
    ok = (pos < jnp.sum(recv_sizes)) & (req_ids >= 0) & (local >= 0) & (
        local < my_count)
    safe_local = jnp.where(ok, local, 0)
    skey = jax.random.fold_in(key, my_rank)
    ind2d = indices.reshape(-1, _LINE)
    if weights is not None:
        out = sample_ops.weighted_sample(
            skey, indptr, indices, weights, safe_local, fanout,
            max_degree=max_degree, indices2d=ind2d,
            weights2d=weights.reshape(-1, _LINE),
            edge_times=times,
            times2d=None if times is None else times.reshape(-1, _LINE),
            seed_time=req_time)
    elif times is not None and req_time is not None:
        out = sample_ops.masked_uniform_sample(
            skey, indptr, indices, safe_local, fanout,
            max_degree=max_degree, indices2d=ind2d,
            edge_times=times, times2d=times.reshape(-1, _LINE),
            seed_time=req_time)
    else:
        out = sample_ops.uniform_sample(
            skey, indptr, indices, safe_local, fanout,
            indices2d=ind2d, max_degree=max_degree)
    okm = ok[:, None]
    neighbors = jnp.where(okm, out.neighbors, -1)
    local_eids = jnp.where(okm, out.edge_ids, -1)
    if edge_id_bits == 64:
        from cugraph_gnn_tpu.ops.edge_ids import combine_local
        hi, edge_ids = combine_local(
            local_eids, edge_base[my_rank, 0], edge_base[my_rank, 1])
    else:
        base = edge_base[my_rank].astype(jnp.int32)
        hi = None
        edge_ids = jnp.where(local_eids >= 0, local_eids + base, -1)
    # route the (k,)-blocks back to the requester
    back_n = alltoallv(neighbors, recv_offsets, recv_sizes, offsets, counts,
                       axis, b)
    back_e = alltoallv(edge_ids, recv_offsets, recv_sizes, offsets, counts,
                       axis, b)
    back_h = None if hi is None else alltoallv(
        hi, recv_offsets, recv_sizes, offsets, counts, axis, b)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(b))
    back_n = back_n[inv]
    back_e = back_e[inv]
    back_h = None if back_h is None else back_h[inv]
    return (back_n, back_e, back_h,
            jnp.sum(back_n >= 0, axis=1).astype(jnp.int32))


class DistNeighborSampler:
    """Multi-hop sampling over a DistGraph: per-rank seed shards, static
    shapes, all single-chip variants (uniform / biased / temporal —
    carried by the DistGraph's weights/times) routed through the
    seed-routing shard body (ref distributed_sampler.py:53-94 variant
    dispatch).

    dedup=False (default): static renumbering layout, zero sorts in the
    hot path.  dedup=True: per-shard append-unique between hops (the
    reference's per-rank deduplicate_sources) — levels stay compact and
    duplicate ids on a shard cost one feature-gather request instead of
    many; ``max_unique_per_hop`` caps the per-shard level capacities.
    """

    def __init__(self, graph: DistGraph, fanouts: Sequence[int],
                 dedup: bool = False,
                 max_unique_per_hop: Optional[Sequence[int]] = None):
        self.graph = graph
        self.fanouts = tuple(int(f) for f in fanouts)
        self.dedup = bool(dedup)
        self.max_unique_per_hop = max_unique_per_hop
        if max_unique_per_hop is not None and not dedup:
            raise ValueError("capacity budgets need dedup=True")

    def _caps(self, local_batch: int) -> List[int]:
        caps = level_capacities(local_batch, self.fanouts)
        if self.max_unique_per_hop is not None:
            from cugraph_gnn_tpu.sampler.heuristics import clamp_level_caps
            clamp_level_caps(caps, [f + 1 for f in self.fanouts],
                             self.max_unique_per_hop)
        return caps

    def sample_shard_fn(self, local_batch: int):
        """Returns the per-shard multihop function for use inside an
        enclosing shard_map (composable with gather/compute).  Signature:
        fn(indptr, indices, edge_base, weights, times, key, seeds,
        node_times) — pass None for absent optionals."""
        g = self.graph
        fanouts = self.fanouts
        dedup = self.dedup
        caps = self._caps(local_batch)
        temporal = g.times is not None

        def fn(indptr, indices, edge_base, weights, times, key, seeds,
               node_times=None):
            def gcount(x):  # globally-replicated count across shards
                return jax.lax.psum(
                    jnp.sum(x >= 0).astype(jnp.int32), g.axis)

            levels = [seeds.astype(jnp.int32)]
            level_counts = [gcount(seeds)]
            seed_time = node_times if temporal else None
            hops: List[HopBlock] = []
            for h, fanout in enumerate(fanouts):
                targets = levels[-1]
                t = targets.shape[0]
                hkey = jax.random.fold_in(key, h)
                nbrs, eids, ehi, _ = _one_hop_shard(
                    indptr, indices, edge_base, hkey, targets,
                    fanout=fanout, book=g.book, axis=g.axis,
                    weights=weights, times=times, seed_time=seed_time,
                    max_degree=g.max_degree, edge_id_bits=g.edge_id_bits)
                if dedup:
                    uniq = append_unique(targets, nbrs.reshape(-1),
                                         max_unique=caps[h + 1])
                    neigh_local = uniq.neighbor_map.reshape(nbrs.shape)
                    next_level = uniq.unique_nodes
                else:
                    pos = (t + jnp.arange(t * fanout, dtype=jnp.int32)
                           ).reshape(nbrs.shape)
                    neigh_local = jnp.where(nbrs >= 0, pos, -1)
                    next_level = jnp.concatenate([targets, nbrs.reshape(-1)])
                hops.append(HopBlock(neigh_local=neigh_local,
                                     neigh_global=nbrs, edge_ids=eids,
                                     edge_hi=ehi))
                levels.append(next_level)
                level_counts.append(gcount(next_level))
                if seed_time is not None:
                    # sampled nodes inherit their seed's time (PyG
                    # temporal semantics) — min over incoming assignment
                    nl = next_level.shape[0]
                    big = jnp.asarray(jnp.iinfo(jnp.int32).max,
                                      seed_time.dtype)
                    tf = jnp.full((nl,), big, seed_time.dtype)
                    tf = tf.at[:t].set(seed_time)
                    flat_loc = neigh_local.reshape(-1)
                    flat_t = jnp.repeat(seed_time, fanout)
                    okt = flat_loc >= 0
                    tf = tf.at[jnp.where(okt, flat_loc, nl - 1)].min(
                        jnp.where(okt, flat_t, big))
                    seed_time = tf
            return MultihopBatch(levels=levels, level_counts=level_counts,
                                 hops=hops, seed_count=level_counts[0],
                                 static_layout=not dedup,
                                 num_shards=g.book.world_size)

        return fn

    def sample(self, key, seeds, node_times=None):
        """Standalone sampling: seeds (and optional per-seed times)
        sharded over the mesh axis; returns a MultihopBatch of sharded
        arrays.  The shard_map step is jitted and memoized per batch
        shape — eager shard_map re-dispatches the big graph operands on
        every primitive (measured ~1000x slower steady-state)."""
        g = self.graph
        cache_key = (int(seeds.shape[0]), node_times is not None)
        jitted = getattr(self, "_jit_cache", None)
        if jitted is None:
            jitted = self._jit_cache = {}
        if cache_key not in jitted:
            fn = self.sample_shard_fn(
                seeds.shape[0] // g.book.world_size)
            n_lvl = len(self.fanouts) + 1
            opt = lambda x: P() if x is None else P(g.axis)
            hi_spec = None if g.edge_id_bits == 32 else P(g.axis)
            shard = jax.shard_map(
                fn, mesh=g.mesh,
                in_specs=(P(g.axis), P(g.axis), P(),
                          opt(g.weights), opt(g.times), P(), P(g.axis),
                          P(g.axis) if node_times is not None else P()),
                out_specs=MultihopBatch(
                    levels=[P(g.axis)] * n_lvl,
                    level_counts=[P()] * n_lvl,
                    hops=[HopBlock(P(g.axis), P(g.axis), P(g.axis),
                                   hi_spec)
                          for _ in self.fanouts],
                    seed_count=P(),
                    static_layout=not self.dedup,
                    num_shards=g.book.world_size),
            )
            jitted[cache_key] = jax.jit(shard)
        return jitted[cache_key](
            g.indptr, g.indices, g.edge_base, g.weights, g.times,
            key, seeds, node_times)
