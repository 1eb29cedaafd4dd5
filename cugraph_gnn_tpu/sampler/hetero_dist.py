"""Heterogeneous distributed sampling over row-sharded per-etype CSRs.

Completes the multi-rank variant matrix of the reference's dispatcher
(ref cugraph_pyg/sampler/distributed_sampler.py:53-94: the
heterogeneous_* x biased/temporal x multi-GPU entries).

Design: every edge type's reversed CSR is indexed by the GLOBAL node id
(data/graph_store.py renumbering), so all etypes share ONE row partition
book: each etype is simply a :class:`DistGraph` over the same mesh axis.
A hop routes the current frontier to owner shards once PER EDGE TYPE
(the same seed-routing ragged-a2a body as the homogeneous sampler,
ops reused verbatim), samples the etype's variant kernel locally, routes
fixed-fanout blocks back, and append-uniques the union per shard —
mirroring the single-chip HeteroNeighborSampler's hop
(sampler/hetero.py:101-190) shard-by-shard.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cugraph_gnn_tpu.ops.unique import append_unique
from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.sampler.dist_sampler import DistGraph, _one_hop_shard
from cugraph_gnn_tpu.sampler.hetero import HeteroMultihopBatch, _etype_str
from cugraph_gnn_tpu.sampler.output import HopBlock


class HeteroDistGraph:
    """Per-edge-type row-sharded CSRs sharing one global-node book.

    edge_id_bits: 32 (combined edge-id space fits int32) or 64 —
    sampled hetero edge ids then come back as (hi, lo) int32 planes
    like the homogeneous path (ops/edge_ids.py; HopBlock.edge_hi),
    with the per-etype base folded in via plane arithmetic."""

    def __init__(self, graphs: Dict[str, DistGraph],
                 edge_base_by_etype: Dict[str, int], mesh, axis: str,
                 edge_id_bits: int = 32):
        self.graphs = graphs
        self.edge_base_by_etype = edge_base_by_etype
        self.mesh = mesh
        self.axis = axis
        self.edge_id_bits = edge_id_bits
        first = next(iter(graphs.values()))
        self.book = first.book

    @staticmethod
    def from_sampling_graph(graph, mesh, axis: str = STORE_AXIS,
                            weights_by_etype: Optional[Dict] = None,
                            times_by_etype: Optional[Dict] = None,
                            edge_id_bits: Optional[int] = None
                            ) -> "HeteroDistGraph":
        """graph: data.graph_store.SamplingGraph (finalized store).
        weights/times: {edge_type: per-edge array in CSR edge order}.
        edge_id_bits: force the edge-id width (default: 32 when the
        combined base+count space fits int32, else 64 — ref int64-id
        sampling, wholegraph_op.h:31-54)."""
        wbe = { _etype_str(k): v
                for k, v in (weights_by_etype or {}).items() }
        tbe = { _etype_str(k): v
                for k, v in (times_by_etype or {}).items() }
        from cugraph_gnn_tpu.store.partition import PartitionBook
        # one shared even row book across etypes: all etypes route seeds
        # in the same global node-id space (per-etype edge-balanced
        # books would disagree on ownership)
        book = PartitionBook.even(graph.num_nodes_total,
                                  mesh.shape[axis])
        total_edges = 0
        for et in graph.etypes:
            indptr, _, edge_base = graph.csr_by_etype[et]
            total_edges = max(
                total_edges,
                int(edge_base) + int(np.asarray(indptr)[-1]))
        if edge_id_bits is None:
            edge_id_bits = 32 if total_edges < 2**31 - 1 else 64
        if edge_id_bits == 32 and total_edges >= 2**31 - 1:
            raise ValueError(
                f"{total_edges} combined hetero edges do not fit 32-bit "
                "edge ids")
        graphs = {}
        ebase = {}
        for et in graph.etypes:
            ename = _etype_str(et)
            indptr, indices, edge_base = graph.csr_by_etype[et]
            n_edges = int(np.asarray(indptr)[-1])
            graphs[ename] = DistGraph.from_global_csr(
                np.asarray(indptr), np.asarray(indices)[:n_edges], mesh,
                axis=axis, weights=_trim(wbe.get(ename), n_edges),
                times=_trim(tbe.get(ename), n_edges), book=book,
                edge_id_bits=edge_id_bits)
            ebase[ename] = int(edge_base)
        return HeteroDistGraph(graphs, ebase, mesh, axis, edge_id_bits)

    @staticmethod
    def from_local_coo(edges_by_etype: Dict, num_nodes_total: int, mesh,
                       axis: str = STORE_AXIS,
                       weights_by_etype: Optional[Dict] = None,
                       times_by_etype: Optional[Dict] = None,
                       edge_id_bits: Optional[int] = None,
                       chunk: int = 1 << 18) -> "HeteroDistGraph":
        """Rank-local heterogeneous construction: every process passes
        only ITS slice of each edge type's COO, in GLOBAL (offset) node
        ids — {edge_type: (src, dst)}.  Each etype routes through the
        chunked device all-to-all (store/edge_exchange.py) over one
        shared even book; no process ever holds a global COO (the
        hetero analog of DistGraph.from_local_coo; ref rank-local put
        graph_store.py:135-208).  Per-etype edge-id bases follow the
        ename-sorted order of allgathered per-etype totals."""
        import jax

        from cugraph_gnn_tpu.store.partition import PartitionBook

        wbe = { _etype_str(k): v
                for k, v in (weights_by_etype or {}).items() }
        tbe = { _etype_str(k): v
                for k, v in (times_by_etype or {}).items() }
        edges = { _etype_str(k): (np.asarray(s), np.asarray(d))
                  for k, (s, d) in edges_by_etype.items() }
        enames = sorted(edges.keys())
        book = PartitionBook.even(num_nodes_total, mesh.shape[axis])

        # per-etype global totals (rank-local lengths allgathered) give
        # the ename-ordered edge-id bases
        my_counts = np.asarray([len(edges[e][0]) for e in enames],
                               np.int64)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            counts = np.asarray(multihost_utils.process_allgather(
                my_counts.astype(np.float64))).sum(axis=0).astype(np.int64)
        else:
            counts = my_counts
        total_edges = int(counts.sum())
        if edge_id_bits is None:
            edge_id_bits = 32 if total_edges < 2**31 - 1 else 64
        if edge_id_bits == 32 and total_edges >= 2**31 - 1:
            raise ValueError(
                f"{total_edges} combined hetero edges do not fit 32-bit "
                "edge ids")
        bases = np.concatenate([[0], np.cumsum(counts)[:-1]])

        graphs = {}
        ebase = {}
        for i, ename in enumerate(enames):
            src, dst = edges[ename]
            graphs[ename] = DistGraph.from_local_coo(
                src, dst, num_nodes_total, mesh, axis=axis,
                weights=wbe.get(ename), times=tbe.get(ename),
                book=book, chunk=chunk, edge_id_bits=edge_id_bits)
            ebase[ename] = int(bases[i])
        return HeteroDistGraph(graphs, ebase, mesh, axis, edge_id_bits)


def _trim(attr, n):
    if attr is None:
        return None
    return np.asarray(attr)[:n]


class HeteroDistNeighborSampler:
    """Multi-hop heterogeneous sampling over a HeteroDistGraph.

    fanouts: list shared by all etypes, or {edge_type: list} (PyG
    fanout-dict semantics).  Temporal: per-seed times ride the same
    a2a geometry as the seed ids (each etype with a ``times`` array
    applies the constraint).  dedup is always on (hetero levels are the
    append-unique union across etypes, like the single-chip sampler).
    """

    def __init__(self, graph: HeteroDistGraph,
                 fanouts: Union[Sequence[int], Dict],
                 max_unique_per_hop: Optional[Sequence[int]] = None):
        self.graph = graph
        self.enames = sorted(graph.graphs.keys())
        if isinstance(fanouts, dict):
            norm = { _etype_str(k): [int(x) for x in v]
                     for k, v in fanouts.items() }
            self.fanouts = { e: norm.get(e) for e in self.enames }
            lens = {len(v) for v in self.fanouts.values() if v is not None}
        else:
            self.fanouts = { e: [int(x) for x in fanouts]
                             for e in self.enames }
            lens = {len(next(iter(self.fanouts.values())))}
        assert len(lens) == 1, "all per-etype fanout lists need one length"
        self.num_hops = lens.pop()
        self.max_unique_per_hop = max_unique_per_hop

    def _level_caps(self, local_batch: int) -> List[int]:
        growth = [
            1 + sum((self.fanouts[e] or [0] * self.num_hops)[h]
                    for e in self.enames)
            for h in range(self.num_hops)
        ]
        caps = [local_batch]
        for g in growth:
            caps.append(caps[-1] * g)
        if self.max_unique_per_hop is not None:
            from cugraph_gnn_tpu.sampler.heuristics import clamp_level_caps
            clamp_level_caps(caps, growth, self.max_unique_per_hop)
        return caps

    def sample_shard_fn(self, local_batch: int):
        """Per-shard multihop body for an enclosing shard_map.
        Signature: fn(graphs_data, key, seeds, node_times) where
        graphs_data = {ename: (indptr, indices, edge_base, weights,
        times)} with per-shard slices."""
        g = self.graph
        axis = g.axis
        caps = self._level_caps(local_batch)
        enames = self.enames

        def fn(graphs_data, key, seeds, node_times=None):
            def gcount(x):
                return jax.lax.psum(jnp.sum(x >= 0).astype(jnp.int32),
                                    axis)

            levels = [seeds.astype(jnp.int32)]
            level_counts = [gcount(seeds)]
            seed_time = node_times
            hops: List[Dict[str, HopBlock]] = []
            for h in range(self.num_hops):
                targets = levels[-1]
                t = targets.shape[0]
                per_type = {}
                all_neighbors = []
                for ei, ename in enumerate(enames):
                    fan = self.fanouts[ename]
                    if fan is None or fan[h] <= 0:
                        continue
                    indptr, indices, edge_base, weights, times = (
                        graphs_data[ename])
                    dg = g.graphs[ename]
                    hkey = jax.random.fold_in(
                        jax.random.fold_in(key, h), ei)
                    st = seed_time if times is not None else None
                    nbrs, eids, ehi, _ = _one_hop_shard(
                        indptr, indices, edge_base, hkey, targets,
                        fanout=fan[h], book=dg.book, axis=axis,
                        weights=weights, times=times, seed_time=st,
                        max_degree=dg.max_degree,
                        edge_id_bits=g.edge_id_bits)
                    base = g.edge_base_by_etype[ename]
                    if g.edge_id_bits == 64:
                        # fold the int64 per-etype base into the (hi, lo)
                        # planes: base = bh*2**30 + bl, carry on lo
                        # overflow (lo < 2**30 so lo+bl < 2**31 is safe
                        # in int32)
                        bh, bl = divmod(int(base), 1 << 30)
                        lo = eids + np.int32(bl)
                        carry = (lo >= (1 << 30)).astype(jnp.int32)
                        lo = lo - carry * np.int32(1 << 30)
                        hi = ehi + np.int32(bh) + carry
                        valid = eids >= 0
                        per_type[ename] = (
                            nbrs, jnp.where(valid, lo, -1),
                            jnp.where(valid, hi, -1))
                    else:
                        eids = jnp.where(
                            eids >= 0, eids + np.int32(base), -1)
                        per_type[ename] = (nbrs, eids, None)
                    all_neighbors.append(nbrs.reshape(-1))
                flat = (jnp.concatenate(all_neighbors) if all_neighbors
                        else jnp.zeros((0,), jnp.int32))
                uniq = append_unique(targets, flat, max_unique=caps[h + 1])
                blocks = {}
                off = 0
                for ename in enames:
                    if ename not in per_type:
                        continue
                    nbrs, eids, ehi = per_type[ename]
                    n = nbrs.size
                    nl = uniq.neighbor_map[off: off + n].reshape(nbrs.shape)
                    off += n
                    blocks[ename] = HopBlock(
                        neigh_local=nl, neigh_global=nbrs, edge_ids=eids,
                        edge_hi=ehi)
                hops.append(blocks)
                levels.append(uniq.unique_nodes)
                level_counts.append(gcount(uniq.unique_nodes))
                if seed_time is not None:
                    big = jnp.asarray(jnp.iinfo(jnp.int32).max,
                                      seed_time.dtype)
                    cap = caps[h + 1]
                    tf = jnp.full((cap,), big, seed_time.dtype)
                    tf = tf.at[:t].set(seed_time)
                    for ename in enames:
                        if ename not in blocks:
                            continue
                        nl = blocks[ename].neigh_local.reshape(-1)
                        flat_t = jnp.repeat(seed_time,
                                            self.fanouts[ename][h])
                        ok = nl >= 0
                        tf = tf.at[jnp.where(ok, nl, cap - 1)].min(
                            jnp.where(ok, flat_t, big))
                    seed_time = tf
            return HeteroMultihopBatch(
                levels=levels, level_counts=level_counts, hops=hops,
                seed_count=level_counts[0],
                num_shards=g.mesh.shape[axis])

        return fn

    def sample(self, key, seeds, node_times=None) -> HeteroMultihopBatch:
        """seeds (global ids, -1 pad) sharded over the mesh axis."""
        g = self.graph
        axis = g.axis
        fn = self.sample_shard_fn(seeds.shape[0] // g.book.world_size)
        n_lvl = self.num_hops + 1
        opt = lambda x: P() if x is None else P(axis)
        graphs_data = {
            e: (dg.indptr, dg.indices, dg.edge_base, dg.weights, dg.times)
            for e, dg in g.graphs.items()
        }
        data_specs = {
            e: (P(axis), P(axis), P(), opt(dg.weights), opt(dg.times))
            for e, dg in g.graphs.items()
        }
        ehi_spec = P(axis) if g.edge_id_bits == 64 else None
        hop_specs = []
        for h in range(self.num_hops):
            hop_specs.append({
                e: HopBlock(P(axis), P(axis), P(axis), ehi_spec)
                for e in self.enames
                if self.fanouts[e] is not None and self.fanouts[e][h] > 0
            })
        shard = jax.shard_map(
            fn, mesh=g.mesh,
            in_specs=(data_specs, P(), P(axis), opt(node_times)),
            out_specs=HeteroMultihopBatch(
                levels=[P(axis)] * n_lvl,
                level_counts=[P()] * n_lvl,
                hops=hop_specs,
                seed_count=P(),
                num_shards=g.mesh.shape[axis]),
        )
        return shard(graphs_data, key, seeds, node_times)
