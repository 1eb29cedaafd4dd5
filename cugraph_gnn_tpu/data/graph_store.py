"""GraphStore: PyG-compatible edge-index store backed by TPU-resident CSR.

ref cugraph_pyg/data/graph_store.py:50-631 — COO-only ``put_edge_index``
keyed by (src_type, rel_type, dst_type), lazy finalize into the sampling
graph, per-type vertex offsets in lexicographic order, optional edge
weight (biased) / edge time (temporal) attributes pulled from a feature
store.

TPU redesign: the "graph" the sampler consumes is a CSR over the
*reversed* edges (rows = destinations), since sampling expands from
seeds along incoming edges (PyG convention).  Heterogeneous graphs are
renumbered into one global id space with per-(node-type) offsets, and
one CSR per edge type (per-edge-type fanouts need per-type row slices).
CSR construction is a host-side sort (numpy; the reference offloads to
libcugraph MGGraph construction).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


EdgeType = Tuple[str, str, str]


def edge_type_str(et: EdgeType) -> str:
    return "__".join(et)


@dataclasses.dataclass
class _EdgeEntry:
    src: np.ndarray
    dst: np.ndarray
    # True when src/dst are this PROCESS's shard of the edges, not the
    # global COO (rank-local puts; ref graph_store.py:135-208 MG mode)
    is_local: bool = False


class GraphStore:
    """Stores typed COO edge indices; ``finalize()`` builds device CSR.

    Mirrors the reference's API surface (put/get/remove edge_index,
    lazy construction on first sampler use, ref graph_store.py:113-133)
    without the external libcugraph dependency.
    """

    def __init__(self, is_multi_gpu: bool = False):
        self._edges: Dict[EdgeType, _EdgeEntry] = {}
        self._num_nodes: Dict[str, int] = {}
        self._graph = None
        self.is_multi_gpu = is_multi_gpu

    # -- PyG GraphStore surface ---------------------------------------------

    def put_edge_index(self, edge_index, edge_type: EdgeType,
                       layout: str = "coo",
                       num_nodes: Optional[Tuple[int, int]] = None):
        """COO only, like the reference (ref graph_store.py:135-208)."""
        if layout != "coo":
            raise ValueError("only layout='coo' is supported (matches ref)")
        src, dst = (np.asarray(edge_index[0]), np.asarray(edge_index[1]))
        st, _, dt = edge_type
        if num_nodes is not None:
            self._num_nodes[st] = max(self._num_nodes.get(st, 0), num_nodes[0])
            self._num_nodes[dt] = max(self._num_nodes.get(dt, 0), num_nodes[1])
        else:
            self._num_nodes[st] = max(self._num_nodes.get(st, 0),
                                      int(src.max(initial=-1)) + 1)
            self._num_nodes[dt] = max(self._num_nodes.get(dt, 0),
                                      int(dst.max(initial=-1)) + 1)
        self._edges[edge_type] = _EdgeEntry(src=src, dst=dst)
        self._graph = None  # invalidate

    def put_local_edge_index(self, edge_index, edge_type: EdgeType,
                             layout: str = "coo",
                             num_nodes: Optional[Tuple[int, int]] = None):
        """Rank-local COO shard: every process passes only ITS slice of
        the edges (ref graph_store.py:135-208 — rank-local put with
        allgathered sizes).  ``num_nodes`` must be the GLOBAL node
        counts; when omitted they are agreed via an allgathered max of
        the local id ranges.  The logical global edge list is the
        rank-order concatenation of the local shards.

        Consumed by DistNeighborLoader, which builds the row-sharded
        DistGraph via the chunked device all-to-all
        (store/edge_exchange.py) — no process ever materialises the
        global COO.  ``finalize()`` (single-host CSR) refuses local
        entries by construction.
        """
        if layout != "coo":
            raise ValueError("only layout='coo' is supported (matches ref)")
        src, dst = (np.asarray(edge_index[0]), np.asarray(edge_index[1]))
        st, _, dt = edge_type
        if num_nodes is None:
            import jax
            hi = np.asarray([int(src.max(initial=-1)) + 1,
                             int(dst.max(initial=-1)) + 1], np.int64)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                hi = np.asarray(multihost_utils.process_allgather(
                    hi.astype(np.float64))).max(axis=0).astype(np.int64)
            num_nodes = (int(hi[0]), int(hi[1]))
        self._num_nodes[st] = max(self._num_nodes.get(st, 0), num_nodes[0])
        self._num_nodes[dt] = max(self._num_nodes.get(dt, 0), num_nodes[1])
        self._edges[edge_type] = _EdgeEntry(src=src, dst=dst, is_local=True)
        self._graph = None

    @property
    def has_local_edges(self) -> bool:
        return any(e.is_local for e in self._edges.values())

    def get_edge_index(self, edge_type: EdgeType, layout: str = "coo"):
        e = self._edges[edge_type]
        return e.src, e.dst

    def remove_edge_index(self, edge_type: EdgeType):
        self._edges.pop(edge_type, None)
        self._graph = None

    def get_all_edge_attrs(self):
        return list(self._edges.keys())

    # -- introspection -------------------------------------------------------

    @property
    def node_types(self) -> List[str]:
        return sorted(self._num_nodes.keys())

    @property
    def edge_types(self) -> List[EdgeType]:
        # lexicographic int order like the reference (graph_store.py int
        # edge types in lexicographic order)
        return sorted(self._edges.keys())

    def num_nodes(self, node_type: Optional[str] = None) -> int:
        if node_type is not None:
            return self._num_nodes[node_type]
        return sum(self._num_nodes.values())

    @property
    def is_homogeneous(self) -> bool:
        return len(self.node_types) <= 1 and len(self._edges) <= 1

    def node_offset(self, node_type: str) -> int:
        """Global-id offset of a node type (lexicographic packing,
        ref graph_store.py vertex offsets per node type :263-329)."""
        off = 0
        for nt in self.node_types:
            if nt == node_type:
                return off
            off += self._num_nodes[nt]
        raise KeyError(node_type)

    # -- finalize into sampling CSR ------------------------------------------

    def finalize(self) -> "SamplingGraph":
        """Build (or return cached) reversed-CSR sampling graph
        (ref graph_store.py:263-329 __construct_graph)."""
        if self.has_local_edges:
            raise ValueError(
                "this store holds rank-LOCAL edge shards "
                "(put_local_edge_index); a single-host SamplingGraph "
                "would need the global COO — use DistNeighborLoader, "
                "which routes shards with the distributed exchange")
        if self._graph is None:
            self._graph = SamplingGraph.build(self)
        return self._graph


@dataclasses.dataclass
class SamplingGraph:
    """Device CSR(s) over the global renumbered id space, reversed edges.

    csr_by_etype: edge-type -> (indptr (N_total+1,), indices, edge_base)
      where row v lists in-neighbors of v under that edge type and
      ``edge_base`` offsets local edge positions into a global edge-id
      space (edge ids are per-type position + base, mirroring the
      reference's edge-id property tensors).
    """

    num_nodes_total: int
    node_offsets: Dict[str, int]
    etypes: List[EdgeType]
    csr_by_etype: Dict[EdgeType, Tuple[jnp.ndarray, jnp.ndarray, int]]
    max_degree_by_etype: Dict[EdgeType, int]
    # CSR position -> input COO position, per edge type (host-side).
    # Sampled edge ids are CSR positions (+ edge_base); edge attributes
    # given in input order convert once via edge_attr_to_csr_order
    # (the analog of the reference's edge property tensors looked up by
    # e_id, ref rgcn_link_class_mnmg.py edge_feature_store[...,'rel']).
    edge_perm_by_etype: Dict[EdgeType, np.ndarray] = dataclasses.field(
        default_factory=dict)

    @staticmethod
    def build(store: GraphStore) -> "SamplingGraph":
        offsets = {nt: store.node_offset(nt) for nt in store.node_types}
        total = store.num_nodes()
        csrs = {}
        maxdeg = {}
        perms = {}
        edge_base = 0
        total_edges = sum(len(e.src) for e in store._edges.values())
        if total_edges >= 2**31 - 1:
            raise ValueError(
                f"{total_edges} edges exceed the single-device int32 "
                "edge-id space (and any realistic single-chip HBM); "
                "shard the graph with sampler.DistGraph / "
                "DistNeighborLoader, whose 64-bit edge-id planes "
                "(ops/edge_ids.py) cover it")
        for et in store.edge_types:
            st, _, dt = et
            e = store._edges[et]
            gsrc = e.src.astype(np.int64) + offsets[st]
            gdst = e.dst.astype(np.int64) + offsets[dt]
            # reversed: rows = destination, cols = source; native
            # counting-sort builder (cpp/csr_builder.cpp)
            from cugraph_gnn_tpu.native import build_csr
            from cugraph_gnn_tpu.ops.window_gather import pad_to_lines
            indptr, indices, perm = build_csr(gdst, gsrc, total)
            # pad to a 512B-line multiple so samplers can use the
            # line-window gather (CSR positions unchanged)
            csrs[et] = (jnp.asarray(indptr, jnp.int32),
                        jnp.asarray(pad_to_lines(
                            np.asarray(indices, np.int32))),
                        edge_base)
            perms[et] = np.asarray(perm)
            deg = indptr[1:] - indptr[:-1]
            maxdeg[et] = int(deg.max(initial=0))
            edge_base += len(e.src)
        return SamplingGraph(
            num_nodes_total=total, node_offsets=offsets,
            etypes=store.edge_types, csr_by_etype=csrs,
            max_degree_by_etype=maxdeg, edge_perm_by_etype=perms)

    def edge_attr_to_csr_order(self, et: EdgeType, attr):
        """Reorder an input-COO-order edge attribute so sampled edge
        ids (CSR position + edge_base) index it directly.  One-time
        host work at load, like the reference's edge property tensor
        construction (ref data/graph_store.py:263-631)."""
        return jnp.asarray(np.asarray(attr)[self.edge_perm_by_etype[et]])

    @property
    def is_homogeneous(self) -> bool:
        return len(self.etypes) <= 1

    def homogeneous_csr(self):
        assert self.is_homogeneous
        et = self.etypes[0]
        indptr, indices, _ = self.csr_by_etype[et]
        return indptr, indices
