"""NodeLoader / NeighborLoader: seed-batched sampling loaders.

ref cugraph_pyg/loader/node_loader.py:16-178 and
neighbor_loader.py:20-236 — PyG-duck-typed loaders: normalize input
nodes, shuffle per epoch, fixed-size batches, delegate to the sampler,
join with features.

TPU redesign: batches are *fixed-size* (last partial batch is padded
with -1 seeds, or dropped with drop_last) so every step reuses one
compiled program — the analog of the reference's fixed
`local_seeds_per_call` call groups (ref distributed_sampler.py:279-343).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.data.feature_store import FeatureStore
from cugraph_gnn_tpu.data.graph_store import GraphStore
from cugraph_gnn_tpu.sampler.neighbor_sampler import NeighborSampler
from cugraph_gnn_tpu.sampler.output import MultihopBatch


@dataclasses.dataclass
class NodeBatch:
    """One sampled training batch (PyG `Data`-ish duck type)."""

    sample: MultihopBatch
    x: Optional[jax.Array]          # (S_L, F) features of sample.input_nodes
    y: Optional[jax.Array]          # (B,) labels of the seeds
    seeds: jax.Array                # (B,) global seed ids (-1 padded)
    input_id: jax.Array             # (B,) positions in the input_nodes list
    batch_size: int

    @property
    def num_valid(self):
        return self.sample.seed_count


# NodeBatch is a pytree (batch_size is static aux data) so a whole batch
# can be passed into a jitted train step directly.
jax.tree_util.register_pytree_node(
    NodeBatch,
    lambda b: ((b.sample, b.x, b.y, b.seeds, b.input_id), b.batch_size),
    lambda bs, c: NodeBatch(*c, batch_size=bs),
)


class NodeLoader:
    """Base loader: shuffling + fixed-size seed batches
    (ref node_loader.py:102-166)."""

    def __init__(self, data: Tuple[FeatureStore, GraphStore], sampler,
                 input_nodes=None, batch_size: int = 512,
                 shuffle: bool = False, drop_last: bool = False,
                 x_attr: str = "x", y_attr: str = "y",
                 input_time=None, seed: int = 0):
        self.feature_store, self.graph_store = data
        self.sampler = sampler
        if input_nodes is None:
            input_nodes = np.arange(self.graph_store.num_nodes())
        # PyG allows (node_type, ids) tuples for hetero input
        self.input_type = None
        if isinstance(input_nodes, tuple):
            self.input_type, input_nodes = input_nodes
            offset = self.graph_store.node_offset(self.input_type)
            input_nodes = np.asarray(input_nodes) + offset
        self.input_nodes = np.asarray(input_nodes).astype(np.int64)
        self.input_time = None if input_time is None else np.asarray(input_time)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.x_attr = x_attr
        self.y_attr = y_attr
        self._epoch = 0
        self._base_key = jax.random.PRNGKey(seed)

    def __len__(self):
        n = len(self.input_nodes)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.input_nodes))
        if self.shuffle:
            rng = np.random.default_rng(self._epoch + 12345)
            rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[NodeBatch]:
        order = self._epoch_order()
        key = jax.random.fold_in(self._base_key, self._epoch)
        self._epoch += 1
        b = self.batch_size
        n_batches = len(self)
        for i in range(n_batches):
            sel = order[i * b: (i + 1) * b]
            input_id = np.full((b,), -1, np.int64)
            input_id[: len(sel)] = sel
            seeds = np.full((b,), -1, np.int64)
            seeds[: len(sel)] = self.input_nodes[sel]
            seeds_j = jnp.asarray(seeds, jnp.int32)
            times = None
            if self.input_time is not None:
                t = np.zeros((b,), self.input_time.dtype)
                t[: len(sel)] = self.input_time[sel]
                times = jnp.asarray(t)
            skey = jax.random.fold_in(key, i)
            sample = self.sampler.sample(skey, seeds_j, times)
            x = self._gather_x(sample)
            y = self._gather_y(seeds_j)
            yield NodeBatch(sample=sample, x=x, y=y, seeds=seeds_j,
                            input_id=jnp.asarray(input_id),
                            batch_size=b)

    def _gather_x(self, sample):
        return gather_node_features(
            self.feature_store, self.graph_store, self.x_attr,
            sample.input_nodes)

    def _gather_y(self, seeds):
        key = ("", self.y_attr) if self.input_type is None else (
            self.input_type, self.y_attr)
        if key not in self.feature_store:
            return None
        if self.input_type is not None:
            # Seeds carry global (offset) ids, but the per-type label
            # tensor is indexed by type-local ids — de-offset before the
            # gather, keeping -1 pads invalid (mirrors _gather_x above).
            off = self.graph_store.node_offset(self.input_type)
            seeds = jnp.where(seeds >= 0, seeds - off, -1)
        return self.feature_store.get_tensor(*key, ids=seeds)


def gather_node_features(feature_store, graph_store, x_attr, input_nodes):
    """Feature join for a sampled node set (shared by node/link loaders).

    Homogeneous: one (S, F) gather.  Heterogeneous: per-node-type feature
    dict — input nodes span all types in the global id space; for each
    type, gather its rows (rows of other types are zero) — RGCN models
    combine these with the type masks implied by the node-offset ranges.
    """
    if graph_store.is_homogeneous:
        if ("", x_attr) not in feature_store:
            return None
        return feature_store.get_tensor("", x_attr, ids=input_nodes)
    out = {}
    for nt in graph_store.node_types:
        if (nt, x_attr) not in feature_store:
            continue
        off = graph_store.node_offset(nt)
        n = graph_store.num_nodes(nt)
        local = input_nodes - off
        ok = (local >= 0) & (local < n)
        out[nt] = feature_store.get_tensor(
            nt, x_attr, ids=jnp.where(ok, local, -1))
    return out or None


class NeighborLoader(NodeLoader):
    """NeighborLoader: builds the sampler from the graph store
    (ref neighbor_loader.py:162-201: CSR default for homogeneous graphs,
    weight_attr -> biased, time_attr -> temporal)."""

    def __init__(self, data: Tuple[FeatureStore, GraphStore],
                 num_neighbors: Sequence[int], input_nodes=None,
                 batch_size: int = 512, shuffle: bool = False,
                 drop_last: bool = False, weight_attr: Optional[str] = None,
                 time_attr: Optional[str] = None, input_time=None,
                 seed: int = 0, dedup: bool = True,
                 max_unique_per_hop: Optional[Sequence[int]] = None,
                 disjoint: bool = False, **kwargs):
        """dedup=False selects the zero-sort static renumbering layout
        (the TPU fast path — the reference's deduplicate_sources=False,
        ref neighbor_loader.py:208-210); max_unique_per_hop caps level
        capacities (memory budget); disjoint=True samples an independent
        subgraph per seed (PyG disjoint mode, ref
        distributed_sampler.py:168-218) — batches then carry (B, cap)
        per-seed arrays and a ``sample.batch`` seed-of-node vector.
        max_unique_per_hop="auto" sizes the caps from device memory
        (the reference's local_seeds_per_call estimate, ref
        distributed_sampler.py:837-875)."""
        feature_store, graph_store = data
        if time_attr is not None and input_time is None:
            raise ValueError(
                "time_attr requires input_time (per-seed times); without "
                "it temporal sampling has no seed times and would "
                "silently run uniform")
        if max_unique_per_hop == "auto":
            from cugraph_gnn_tpu.sampler.heuristics import (
                resolve_feature_dim,
                resolve_max_unique_per_hop,
            )
            fd = resolve_feature_dim(feature_store, graph_store,
                                     kwargs.get("x_attr", "x"))
            max_unique_per_hop = resolve_max_unique_per_hop(
                "auto", batch_size, num_neighbors, fd)
            dedup = True  # caps require the dedup renumbering layout
        # typed target segments (hetero dedup=False fast path): with a
        # typed input_nodes=(ntype, ids), each etype expands only its
        # dst-type level positions (PyG hetero semantics) — at mag
        # shape this is 2.5x the untyped static layout (PERF_NOTES
        # round 5).  Temporal sampling stays on the untyped path.
        seed_type = None
        if (not dedup and time_attr is None and not disjoint
                and isinstance(input_nodes, tuple)):
            seed_type = input_nodes[0]
        sampler = build_neighbor_sampler(
            feature_store, graph_store, num_neighbors,
            weight_attr=weight_attr, time_attr=time_attr, dedup=dedup,
            max_unique_per_hop=max_unique_per_hop, disjoint=disjoint,
            seed_type=seed_type)
        super().__init__(data, sampler, input_nodes=input_nodes,
                         batch_size=batch_size, shuffle=shuffle,
                         drop_last=drop_last, input_time=input_time,
                         seed=seed, **kwargs)


def build_neighbor_sampler(feature_store, graph_store, num_neighbors,
                           weight_attr=None, time_attr=None,
                           dedup: bool = True, max_unique_per_hop=None,
                           disjoint: bool = False, seed_type=None):
    """Construct the right sampler for a graph store (shared by
    NeighborLoader and LinkNeighborLoader): homogeneous CSR sampler
    (uniform/biased/temporal, optionally disjoint) or the hetero
    per-edge-type sampler (ref neighbor_loader.py:162-201)."""
    graph = graph_store.finalize()
    if graph.is_homogeneous:
        indptr, indices = graph.homogeneous_csr()
        et = graph.etypes[0]
        weights = None
        times = None
        maxdeg = None
        if weight_attr is not None:
            w = feature_store.get_tensor("", weight_attr)
            weights = _edge_attr_to_csr_order(graph_store, graph, et, w)
            maxdeg = graph.max_degree_by_etype[et]
        if time_attr is not None:
            t = feature_store.get_tensor("", time_attr)
            times = _edge_attr_to_csr_order(graph_store, graph, et, t)
            maxdeg = graph.max_degree_by_etype[et]
        sampler = NeighborSampler(
            indptr, indices, num_neighbors, weights=weights,
            edge_times=times, max_degree=maxdeg,
            dedup=True if disjoint else dedup,
            max_unique_per_hop=max_unique_per_hop)
        if disjoint:
            from cugraph_gnn_tpu.sampler.disjoint import (
                DisjointNeighborSampler,
            )
            sampler = DisjointNeighborSampler(sampler)
        return sampler

    from cugraph_gnn_tpu.sampler.hetero import HeteroNeighborSampler

    def _collect(attr):
        return collect_edge_attrs_by_etype(
            feature_store, graph_store, graph, attr)

    effective_dedup = (True if (disjoint or max_unique_per_hop is not None)
                       else dedup)
    sampler = HeteroNeighborSampler(
        graph, num_neighbors,
        weights_by_etype=_collect(weight_attr),
        times_by_etype=_collect(time_attr),
        max_unique_per_hop=max_unique_per_hop,
        dedup=effective_dedup,
        seed_type=None if effective_dedup else seed_type)
    if disjoint:
        # per-seed typed subgraphs (PyG disjoint over hetero loaders,
        # ref distributed_sampler.py:168-218 disjoint batch offsets)
        from cugraph_gnn_tpu.sampler.disjoint import (
            DisjointNeighborSampler,
        )
        sampler = DisjointNeighborSampler(sampler)
    return sampler


def _edge_attr_to_csr_order(graph_store: GraphStore, graph, et, attr):
    """Edge attributes are stored in COO input order; the CSR edge id is
    its position after the sort — re-order once at load (the graph
    retains each edge type's sort permutation)."""
    return graph.edge_attr_to_csr_order(et, attr)


def collect_edge_attrs_by_etype(feature_store, graph_store, graph, attr):
    """Pull a per-edge attribute for every edge type that has it, in CSR
    edge-id order (weight_attr -> biased, time_attr -> temporal; ref
    neighbor_loader.py:173-190 pulls edge property tensors from the
    feature store keyed by edge type).  Shared by the single-chip and
    distributed hetero loaders."""
    from cugraph_gnn_tpu.data.graph_store import edge_type_str

    if attr is None:
        return None
    out = {}
    for et in graph.etypes:
        ekey = edge_type_str(et)
        if (ekey, attr) in feature_store:
            out[et] = _edge_attr_to_csr_order(
                graph_store, graph, et, feature_store.get_tensor(ekey, attr))
    if not out:
        raise KeyError(
            f"no edge type has attribute {attr!r} in the "
            "feature store (keys are (edge_type_str, attr))")
    return out
