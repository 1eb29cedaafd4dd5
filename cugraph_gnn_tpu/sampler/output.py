"""Sampler output structures (static-shape, jit-carried).

TPU-native replacement for the reference's SamplerOutput decoding
(ref cugraph_pyg/sampler/sampler.py:171-740): instead of dynamically
sized CSC/COO tensors, a sampled mini-batch is a pytree of fixed-shape
arrays padded with -1.

Layout ("multihop ELL"):

- ``levels[0]`` = seed nodes; ``levels[l+1]`` = unique nodes discovered
  by sampling neighbors of ``levels[l]`` (targets of level l are a
  prefix of level l+1, mirroring the reference's append_unique
  semantics, ref pylibwholegraph/torch/graph_structure.py:136-196).
- ``hops[l]`` connects level ``l`` targets to their sampled neighbors as
  **local indices into levels[l+1]** in a fixed-fanout (S_l, k_l) block.

A 2-layer GNN then runs input-to-output:
``h_{L-1} = conv(x[levels[L]], hops[L-1]) ... h_0 = conv(h_1, hops[0])``.

Conversion helpers produce PyG-style COO (row/col/node/batch +
num_sampled_nodes/num_sampled_edges) for API parity.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class HopBlock(NamedTuple):
    """Fixed-fanout bipartite block between level l (targets) and
    level l+1 (sources)."""

    neigh_local: jax.Array   # (S_l, k_l) int32 index into levels[l+1], -1 pad
    neigh_global: jax.Array  # (S_l, k_l) int32 global node ids, -1 pad
    edge_ids: jax.Array      # (S_l, k_l) int32 global edge ids, -1 pad
    # High int32 plane of 64-bit global edge ids (graphs beyond 2**31
    # edges; ops/edge_ids.py: id = edge_hi * 2**30 + edge_ids).  None on
    # 32-bit graphs, where ``edge_ids`` is the full id.
    edge_hi: Optional[jax.Array] = None

    @property
    def mask(self):
        return self.neigh_local >= 0

    def edge_ids64(self) -> np.ndarray:
        """Host-side int64 global edge ids (works for both widths)."""
        if self.edge_hi is None:
            return np.asarray(self.edge_ids).astype(np.int64)
        from cugraph_gnn_tpu.ops.edge_ids import to_int64_np
        return to_int64_np(np.asarray(self.edge_hi),
                           np.asarray(self.edge_ids))


class MultihopBatch(NamedTuple):
    """A sampled mini-batch with L hops.

    levels: list of (S_l,) global node id arrays, -1 padded; levels[0]
      are the seeds.  levels[l] is a prefix of levels[l+1].
    level_counts: list of () int32 — valid node count per level.
    hops: list of L HopBlocks, hops[l] between levels[l] and levels[l+1].
    seed_count: () int32 number of valid seeds.
    """

    levels: List[jax.Array]
    level_counts: List[jax.Array]
    hops: List[HopBlock]
    seed_count: jax.Array
    # Static (pytree-aux) layout flag: True when levels follow the
    # dedup=False positional layout — levels[l+1] = [targets | neighbors
    # row-major], i.e. hops[l].neigh_local is exactly
    # S_l + arange(S_l*k_l) at the valid slots.  Consumers (models) can
    # then read neighbor activations with a free slice+reshape instead
    # of a row gather — on v5e the hop-1 gather of ~113k rows is
    # row-rate-bound (~227M rows/s), so this removes ~0.5 ms/step.
    static_layout: bool = False
    # Static (pytree-aux) shard count.  Distributed samplers run one
    # copy of the multihop body per mesh shard; the global arrays
    # returned by shard_map are the per-shard arrays CONCATENATED, so
    # levels[l] is NOT a prefix of levels[l+1] and neigh_local is
    # shard-relative.  num_shards > 1 tells consumers (the model zoo,
    # dst_activations / gather_neighbors below) to index blockwise.
    num_shards: int = 1

    @property
    def num_hops(self) -> int:
        return len(self.hops)

    @property
    def input_nodes(self):
        """Deepest level — the nodes whose features must be gathered."""
        return self.levels[-1]

    def dst_activations(self, h, hop_index: int):
        """The level-l target rows of ``h``, the level-(l+1) activation
        array (h.shape[0] == len(levels[l+1])).  Single-shard: a prefix
        slice; sharded: each shard's targets prefix its slice."""
        s_l = self.hops[hop_index].neigh_local.shape[0]
        return shard_prefix(h, s_l, self.num_shards)

    def gather_neighbors(self, h, hop_index: int):
        """Neighbor activations (S_l, k, F) of hop l from the
        level-(l+1) activation array ``h``; -1 slots carry garbage rows
        (mask with hops[l].mask).  Uses the free positional slice when
        the batch has the dedup=False static layout."""
        hop = self.hops[hop_index]
        s_l, k = hop.neigh_local.shape
        w = self.num_shards
        if self.static_layout and h.shape[0] == s_l * (k + 1):
            t_l, t_next = s_l // w, h.shape[0] // w
            body = h.reshape(w, t_next, h.shape[-1])[:, t_l:]
            return body.reshape(s_l, k, h.shape[-1])
        return shard_gather(h, hop.neigh_local, w)


def shard_prefix(h, s_l: int, num_shards: int = 1):
    """First t_l = s_l / W rows of each of W equal blocks of ``h``
    (= h[:s_l] when W == 1): per-shard levels put targets first."""
    if num_shards == 1:
        return h[:s_l]
    t_next = h.shape[0] // num_shards
    t_l = s_l // num_shards
    return h.reshape(num_shards, t_next, *h.shape[1:])[:, :t_l].reshape(
        s_l, *h.shape[1:])


def shard_gather(h, neigh_local, num_shards: int = 1):
    """h[neigh_local] with shard-relative indices: row i of neigh_local
    belongs to shard i // (S_l / W) and indexes into that shard's block
    of ``h``.  -1 indices read row 0 of the shard (callers mask)."""
    safe = jnp.where(neigh_local >= 0, neigh_local, 0)
    if num_shards == 1:
        return h[safe]
    s_l = neigh_local.shape[0]
    t_next = h.shape[0] // num_shards
    t_l = s_l // num_shards
    off = (jnp.arange(s_l, dtype=jnp.int32) // t_l) * t_next
    return h[safe + off[:, None]]


jax.tree_util.register_pytree_node(
    MultihopBatch,
    lambda b: ((b.levels, b.level_counts, b.hops, b.seed_count),
               (b.static_layout, b.num_shards)),
    lambda aux, c: MultihopBatch(*c, static_layout=aux[0],
                                 num_shards=aux[1]),
)


class COOSample(NamedTuple):
    """PyG-style flattened sample (ref cugraph_pyg/sampler/sampler.py COO
    decoder :642-730): renumbered edges over the unique node list."""

    node: jax.Array            # (N,) global node ids, -1 pad
    row: jax.Array             # (E,) local dst index (PyG row = dst of message)
    col: jax.Array             # (E,) local src index
    edge: jax.Array            # (E,) global edge ids
    num_sampled_nodes: jax.Array  # (L+1,) nodes discovered per hop level
    num_sampled_edges: jax.Array  # (L,) valid edges per hop
    # high int32 plane of 64-bit edge ids (None on 32-bit graphs)
    edge_hi: Optional[jax.Array] = None

    def edge_ids64(self) -> np.ndarray:
        """Host-side int64 global edge ids (both widths)."""
        if self.edge_hi is None:
            return np.asarray(self.edge).astype(np.int64)
        from cugraph_gnn_tpu.ops.edge_ids import to_int64_np
        return to_int64_np(np.asarray(self.edge_hi), np.asarray(self.edge))


class CSCSample(NamedTuple):
    """PyG-style CSC sample (ref cugraph_pyg/sampler/sampler.py:525-640
    CSC decoder): per-hop compressed columns over the unique node list.
    Fixed-fanout rows compress trivially: colptr is uniform * fanout."""

    node: jax.Array                # (N,) global node ids, -1 pad
    colptr: List[jax.Array]        # per hop: (S_l + 1,)
    row: List[jax.Array]           # per hop: (S_l * k_l,) local src ids
    edge: List[jax.Array]          # per hop: (S_l * k_l,) global edge ids
    num_sampled_nodes: jax.Array
    num_sampled_edges: jax.Array
    # per-hop high int32 planes of 64-bit edge ids (None on 32-bit)
    edge_hi: Optional[List[jax.Array]] = None


def to_csc(batch: MultihopBatch) -> CSCSample:
    """CSC view of a multihop batch (dst-major compressed).

    Valid entries are compacted to the front in row-major (= column-
    grouped) order with a stable sort, so ``row[colptr[i]:colptr[i+1]]``
    really is column i's entries — a consumable CSC like the reference
    decoder's (ref cugraph_pyg/sampler/sampler.py:525-640).  Slots past
    ``colptr[-1]`` are -1 padding.
    """
    colptrs, rows, edges, his, n_edges = [], [], [], [], []
    for hop in batch.hops:
        s, k = hop.neigh_local.shape
        m = hop.mask
        cnt = jnp.sum(m, axis=1).astype(jnp.int32)
        colptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
        flat_m = m.reshape(-1)
        # stable partition: valid entries first, original (column-major-
        # grouped) order preserved
        order = jnp.argsort(~flat_m, stable=True)
        rows.append(jnp.where(flat_m, hop.neigh_local.reshape(-1),
                              -1)[order])
        edges.append(jnp.where(flat_m, hop.edge_ids.reshape(-1),
                               -1)[order])
        if hop.edge_hi is not None:
            his.append(jnp.where(flat_m, hop.edge_hi.reshape(-1),
                                 0)[order])
        colptrs.append(colptr)
        n_edges.append(jnp.sum(m).astype(jnp.int32))
    counts = [batch.level_counts[0]] + [
        batch.level_counts[i + 1] - batch.level_counts[i]
        for i in range(len(batch.hops))
    ]
    return CSCSample(
        node=batch.levels[-1], colptr=colptrs, row=rows, edge=edges,
        num_sampled_nodes=jnp.stack(counts),
        num_sampled_edges=jnp.stack(n_edges),
        edge_hi=his if his else None)


def to_coo(batch: MultihopBatch) -> COOSample:
    """Flatten a MultihopBatch into PyG-style COO with per-hop counts."""
    node = batch.levels[-1]
    rows, cols, edges, his, n_edges = [], [], [], [], []
    for hop in batch.hops:
        s, k = hop.neigh_local.shape
        dst_local = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[:, None], (s, k))
        m = hop.mask
        rows.append(jnp.where(m, dst_local, -1).reshape(-1))
        cols.append(jnp.where(m, hop.neigh_local, -1).reshape(-1))
        edges.append(jnp.where(m, hop.edge_ids, -1).reshape(-1))
        if hop.edge_hi is not None:
            his.append(jnp.where(m, hop.edge_hi, 0).reshape(-1))
        n_edges.append(jnp.sum(m).astype(jnp.int32))
    counts = [batch.level_counts[0]] + [
        batch.level_counts[i + 1] - batch.level_counts[i]
        for i in range(len(batch.hops))
    ]
    return COOSample(
        node=node,
        row=jnp.concatenate(rows),
        col=jnp.concatenate(cols),
        edge=jnp.concatenate(edges),
        num_sampled_nodes=jnp.stack(counts),
        num_sampled_edges=jnp.stack(n_edges),
        edge_hi=jnp.concatenate(his) if his else None,
    )
