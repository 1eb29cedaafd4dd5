"""FullBatchGraph: the product surface for full-batch message passing.

Bundles the TPU-first full-batch pipeline into one object:

    fbg = FullBatchGraph.from_csr(indptr, indices, reorder="auto")
    x_g = fbg.to_graph_order(x)        # once, at load time
    h   = fbg.spmm(x_g, reduce="mean")  # slab MXU path + exact fallback
    out = fbg.to_input_order(h)         # once, at the output boundary

Pipeline: optional RCM reorder (ops/reorder.py) -> banded slab split
(ops/pallas/slab_kernel.py) -> MXU aggregation with segment fallback.
On locality graphs this runs 5-9x past the gather row-rate wall
(PERF_NOTES.md "slab path"); on random graphs the auto mode detects a
low band fraction and keeps the degree-bucketed ELL composite.

Train IN graph order: permuting node data costs two full-table gathers
per call, so `to_graph_order` is meant to be applied once to features/
labels at load time, with ids mapped through `inv_order` — the same
contract as the reference's one-time graph construction
(ref cugraph_pyg/data/graph_store.py:263-329).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
    build_slab_graph,
    slab_spmm,
)
from cugraph_gnn_tpu.ops.reorder import reorder_csr
from cugraph_gnn_tpu.ops.spmm import EllBuckets, ell_spmm, segment_spmm


class FullBatchGraph:
    """See module docstring.  reorder: 'rcm' | 'none' | 'auto' (RCM,
    kept only if it raises the band fraction); min_band_fraction gates
    the slab path (below it, the ELL composite wins)."""

    def __init__(self, indptr, indices, weights=None, *,
                 reorder: str = "auto", block_rows: int = 256,
                 max_k: int = 64, min_band_fraction: float = 0.5):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        n = len(indptr) - 1
        self.num_nodes = n
        if reorder not in ("rcm", "none", "auto"):
            raise ValueError(f"unknown reorder {reorder!r}")
        self._order = None
        use_rcm = reorder in ("rcm", "auto")
        if use_rcm:
            rg = reorder_csr(indptr, indices)
            w_r = None if weights is None else np.asarray(weights)[rg.edge_perm]
            slab_r = build_slab_graph(rg.indptr, rg.indices, w_r,
                                      block_rows=block_rows, max_k=max_k)
        if reorder == "auto":
            slab_i = build_slab_graph(indptr, indices, weights,
                                      block_rows=block_rows, max_k=max_k)
            if use_rcm and slab_r.band_fraction > slab_i.band_fraction:
                self.slab, self._order = slab_r, rg
                indptr, indices = rg.indptr, rg.indices
                weights = w_r
            else:
                self.slab = slab_i
        elif reorder == "rcm":
            self.slab, self._order = slab_r, rg
            indptr, indices = rg.indptr, rg.indices
            weights = w_r
        else:
            self.slab = build_slab_graph(indptr, indices, weights,
                                         block_rows=block_rows, max_k=max_k)
        self.band_fraction = self.slab.band_fraction
        self.use_slab = self.band_fraction >= min_band_fraction
        self._indptr = indptr
        self._indices = jnp.asarray(indices.astype(np.int32))
        self._weights = None if weights is None else jnp.asarray(
            np.asarray(weights, np.float32))
        deg = (np.asarray(indptr)[1:] - np.asarray(indptr)[:-1])
        self._rows = jnp.asarray(
            np.repeat(np.arange(n, dtype=np.int32), deg))
        self._ell: Optional[EllBuckets] = None
        self.degrees = self.slab.degrees[:n]
        # Transposed slab for autodiff: d/dx (A @ x) = A^T @ g, and the
        # transpose of a banded graph is banded with the same bandwidth,
        # so the backward pass rides the same MXU kernel.
        indptr_np = np.asarray(indptr)
        deg_np = indptr_np[1:] - indptr_np[:-1]
        rows_np = np.repeat(np.arange(n, dtype=np.int32),
                            deg_np.astype(np.int64))
        cols_np = np.asarray(indices, np.int32)
        ok = (cols_np >= 0) & (cols_np < n)
        from cugraph_gnn_tpu.native import build_csr
        t_indptr, t_indices, t_perm = build_csr(
            cols_np[ok], rows_np[ok], n)
        t_w = None
        if weights is not None:
            t_w = np.asarray(weights, np.float32)[ok][t_perm]
        self._slab_t = build_slab_graph(t_indptr, t_indices, t_w,
                                        block_rows=block_rows, max_k=max_k)
        self._diff_spmm = {}
        self._block_rows = block_rows
        self._max_k = max_k
        self._attn_pair = None
        self._diff_attn = {}

    # -- node-order mapping ---------------------------------------------

    @property
    def order(self):
        """(N,) graph-order -> input-order map (None if not reordered)."""
        return None if self._order is None else self._order.order

    @property
    def inv_order(self):
        return None if self._order is None else self._order.inv_order

    def to_graph_order(self, x):
        return x if self._order is None else x[jnp.asarray(self._order.order)]

    def to_input_order(self, x):
        if self._order is None:
            return x
        return x[jnp.asarray(self._order.inv_order)]

    def map_ids(self, ids):
        """Input-order node ids -> graph-order ids (-1 passes through)."""
        if self._order is None:
            return ids
        inv = jnp.asarray(self._order.inv_order)
        return jnp.where(ids >= 0, inv[jnp.clip(ids, 0)], -1)

    # -- aggregation ------------------------------------------------------

    def _diff_slab_spmm(self, reduce: str, compute_dtype):
        """custom_vjp wrapper: forward = slab kernel over the graph,
        backward = slab kernel over the transposed graph (both include
        their fallback edges, so gradients are exact for any graph)."""
        key = (reduce, compute_dtype)
        if key not in self._diff_spmm:
            slab, slab_t = self.slab, self._slab_t
            deg = jnp.maximum(self.degrees, 1)

            @jax.custom_vjp
            def f(x):
                return slab_spmm(slab, x, reduce=reduce,
                                 compute_dtype=compute_dtype)

            def fwd(x):
                # zero-size residual carries the primal dtype
                return f(x), jnp.zeros((0,), x.dtype)

            def bwd(res, g):
                if reduce == "mean":
                    g = g / deg[:, None].astype(g.dtype)
                gx = slab_spmm(slab_t, g, reduce="sum",
                               compute_dtype=compute_dtype)
                return (gx.astype(res.dtype),)

            f.defvjp(fwd, bwd)
            self._diff_spmm[key] = f
        return self._diff_spmm[key]

    def _diff_attention(self, negative_slope: float):
        """Differentiable fused attention over the symmetric slab pair
        (built lazily once; cached per negative_slope)."""
        if negative_slope not in self._diff_attn:
            if self._attn_pair is None:
                from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                    build_attention_slab_pair)
                self._attn_pair = build_attention_slab_pair(
                    np.asarray(self._indptr), np.asarray(self._indices),
                    block_rows=self._block_rows, max_k=self._max_k)
            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                differentiable_slab_attention)
            self._diff_attn[negative_slope] = differentiable_slab_attention(
                self._attn_pair, negative_slope=negative_slope)
        return self._diff_attn[negative_slope]

    def spmm(self, x, reduce: str = "mean", *, compute_dtype=jnp.float32):
        """out[r] = reduce over row r's neighbors of w * x[c]; x and out
        in GRAPH order."""
        if self.use_slab and reduce in ("sum", "mean"):
            return self._diff_slab_spmm(reduce, compute_dtype)(x)
        if self._ell is None:
            self._ell = EllBuckets(self._indptr, np.asarray(self._indices))
        if self._weights is None and reduce in ("sum", "mean", "max"):
            return ell_spmm(self._ell, x, reduce=reduce)
        return segment_spmm(x, self._indices, self._rows, self.num_nodes,
                            reduce=reduce, edge_weight=self._weights,
                            indices_are_sorted=True)

    def _diff_attention_mh(self, negative_slope: float):
        key = ("mh", negative_slope)
        if key not in self._diff_attn:
            if self._attn_pair is None:
                from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                    build_attention_slab_pair)
                self._attn_pair = build_attention_slab_pair(
                    np.asarray(self._indptr), np.asarray(self._indices),
                    block_rows=self._block_rows, max_k=self._max_k)
            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                differentiable_slab_attention_mh)
            self._diff_attn[key] = differentiable_slab_attention_mh(
                self._attn_pair, negative_slope=negative_slope)
        return self._diff_attn[key]

    def attention_spmm_mh(self, x, alpha_dst, alpha_src, *,
                          negative_slope: float = 0.2):
        """Multi-head fused attention aggregate: x (N, H, F),
        alpha_dst/alpha_src (N, H) -> (N, H, F) f32.  On the slab path
        all H heads run in ONE kernel pass per direction (forward and
        backward), amortizing the adjacency reconstruction (measured
        1.28x fwd / 1.57x bwd over the per-head loop at H=4, v5e);
        heads beyond the packed-lane budget run in head-group chunks
        of MAX_PACKED_HEADS (adjacency still amortized per chunk, not
        per head); off the slab path: per-head single-head calls."""
        from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
            MAX_PACKED_HEADS)
        heads = x.shape[1]
        if self.use_slab:
            if heads <= MAX_PACKED_HEADS:
                return self._diff_attention_mh(negative_slope)(
                    x, alpha_dst, alpha_src)
            return jnp.concatenate([
                self.attention_spmm_mh(
                    x[:, h0:h0 + MAX_PACKED_HEADS],
                    alpha_dst[:, h0:h0 + MAX_PACKED_HEADS],
                    alpha_src[:, h0:h0 + MAX_PACKED_HEADS],
                    negative_slope=negative_slope)
                for h0 in range(0, heads, MAX_PACKED_HEADS)
            ], axis=1)
        return jnp.stack([
            self.attention_spmm(x[:, h], alpha_dst[:, h], alpha_src[:, h],
                                negative_slope=negative_slope)
            for h in range(heads)
        ], axis=1)

    def attention_spmm(self, x, alpha_dst, alpha_src, *,
                       negative_slope: float = 0.2):
        """Fused GAT attention aggregate (see slab_attention_spmm),
        differentiable: both passes ride the banded MXU kernels via the
        symmetric slab split (ops/pallas/slab_attn_grad.py).  Falls back
        to the COO sddmm+softmax+spmm chain off the slab path."""
        if self.use_slab:
            return self._diff_attention(negative_slope)(
                x, alpha_dst, alpha_src)
        from cugraph_gnn_tpu.ops.sddmm import coo_edge_softmax
        e = alpha_dst[self._rows] + alpha_src[jnp.clip(self._indices, 0)]
        e = jnp.where(e >= 0, e, negative_slope * e)
        p = coo_edge_softmax(e, self._rows, self.num_nodes)
        return segment_spmm(x.astype(jnp.float32), self._indices, self._rows,
                            self.num_nodes, reduce="sum", edge_weight=p)

    @classmethod
    def from_coo(cls, src, dst, num_nodes: int, weights=None, **kw):
        from cugraph_gnn_tpu.native import build_csr
        indptr, indices, perm = build_csr(
            np.asarray(dst, np.int32), np.asarray(src, np.int32), num_nodes)
        w = None if weights is None else np.asarray(weights)[perm]
        return cls(indptr, indices, w, **kw)


def _band_share(src, dst, block_rows: int) -> float:
    """Host estimate of the slab-band edge share for an order: fraction
    of edges with |src - dst| <= block_rows (the slab keeps columns
    within one block radius of the row block)."""
    if len(src) == 0:
        return 0.0
    return float(np.mean(np.abs(src.astype(np.int64)
                                - dst.astype(np.int64)) <= block_rows))


class RelationalFullBatch:
    """Per-relation FullBatchGraphs over ONE shared node order — the
    full-batch R-GCN surface (BASELINE config 4).

    R-GCN's aggregation is a sum over relations of independent SpMMs:
    out = W_root x + sum_r W_r (A_r x).  Each relation gets its own
    banded slab (with its own transpose for autodiff), all built on the
    UNION graph's RCM order so one graph-order ``x`` serves every
    relation — per-relation reorders would need R permuted copies of
    the node data.  Ref analog: FastRGCNConv consumed at
    /root/reference/python/cugraph-pyg/cugraph_pyg/examples/rgcn_link_class_mnmg.py
    (relation looked up from the sampled batch's edge ids).

    Parameters mirror FullBatchGraph; ``reorder='auto'`` keeps the RCM
    order only if it raises the union band share.
    """

    def __init__(self, src, dst, edge_type, num_relations: int,
                 num_nodes: int, *, reorder: str = "auto",
                 block_rows: int = 256, max_k: int = 64,
                 min_band_fraction: float = 0.5):
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        et = np.asarray(edge_type, np.int32)
        if not (len(src) == len(dst) == len(et)):
            raise ValueError("src/dst/edge_type length mismatch")
        if reorder not in ("rcm", "none", "auto"):
            raise ValueError(f"unknown reorder {reorder!r}")
        self.num_nodes = int(num_nodes)
        self.num_relations = int(num_relations)
        self._order_struct = None
        if reorder in ("rcm", "auto") and len(src):
            from cugraph_gnn_tpu.native import build_csr
            u_indptr, u_indices, _ = build_csr(dst, src, num_nodes)
            rg = reorder_csr(u_indptr, u_indices)
            ns = rg.inv_order[src]
            nd = rg.inv_order[dst]
            if reorder == "rcm" or (_band_share(ns, nd, block_rows)
                                    > _band_share(src, dst, block_rows)):
                self._order_struct = rg
                src, dst = ns, nd
        self.graphs = []
        for r in range(num_relations):
            m = et == r
            self.graphs.append(FullBatchGraph.from_coo(
                src[m], dst[m], num_nodes, reorder="none",
                block_rows=block_rows, max_k=max_k,
                min_band_fraction=min_band_fraction))
        self.band_fraction = (
            float(np.mean([g.band_fraction for g in self.graphs]))
            if self.graphs else 0.0)

    # -- node-order mapping (same contract as FullBatchGraph) -----------

    @property
    def order(self):
        return (None if self._order_struct is None
                else self._order_struct.order)

    @property
    def inv_order(self):
        return (None if self._order_struct is None
                else self._order_struct.inv_order)

    def to_graph_order(self, x):
        if self._order_struct is None:
            return x
        return x[jnp.asarray(self._order_struct.order)]

    def to_input_order(self, x):
        if self._order_struct is None:
            return x
        return x[jnp.asarray(self._order_struct.inv_order)]

    def map_ids(self, ids):
        if self._order_struct is None:
            return ids
        inv = jnp.asarray(self._order_struct.inv_order)
        return jnp.where(ids >= 0, inv[jnp.clip(ids, 0)], -1)
