"""Locality-optimizing node reordering (host-side preprocessing).

Why this exists on TPU: XLA's random-row gather is row-rate bound
(~227M rows/s measured on v5e, PERF_NOTES.md), so full-batch SpMM over
an arbitrary node order cannot exceed ~116 GB/s at 512B rows.  GPUs
absorb irregular reuse in L2; the TPU replacement is *making* the reuse
spatial: RCM reordering gives neighbors nearby ids, which turns per-row
random gathers into contiguous slabs the slab-SpMM path can DMA in bulk
(ops/spmm.py slab_spmm).  The reference has no counterpart — this is a
TPU-first component.

Everything here runs on the HOST once per graph (preprocessing), like
the reference's one-time MGGraph construction
(ref cugraph_pyg/data/graph_store.py:263-631).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from cugraph_gnn_tpu import native


class ReorderedGraph(NamedTuple):
    """A relabeled CSR plus the maps to carry node/edge data across.

    order:      (N,) int32, order[new_id] = old_id — permute node data
                with ``x_new = x_old[order]``.
    inv_order:  (N,) int32, inv_order[old_id] = new_id — map external
                node ids (seeds, labels indices) into the new space.
    edge_perm:  (E,) int64, new edge position -> old edge position —
                permute edge data with ``w_new = w_old[edge_perm]``.
    """

    indptr: np.ndarray
    indices: np.ndarray
    order: np.ndarray
    inv_order: np.ndarray
    edge_perm: np.ndarray


def reorder_csr(indptr, indices, method: str = "rcm") -> ReorderedGraph:
    """Compute a locality order and relabel the CSR by it.

    method: 'rcm' (reverse Cuthill-McKee, the bandwidth-minimizing
    default) or 'none' (identity — useful for A/B benchmarking).
    """
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    n = len(indptr) - 1
    if method == "none":
        order = np.arange(n, dtype=np.int32)
    elif method == "rcm":
        order = native.rcm_order(indptr, indices)
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    new_indptr, new_indices, edge_perm = native.apply_order_csr(
        indptr, indices, order)
    inv = np.zeros(n, np.int32)
    inv[order] = np.arange(n, dtype=np.int32)
    return ReorderedGraph(indptr=new_indptr, indices=new_indices,
                          order=order, inv_order=inv, edge_perm=edge_perm)


def bandwidth_stats(indptr, indices, percentile: float = 95.0):
    """Graph bandwidth diagnostics: per-edge |dst - src| distribution.
    Small p95 bandwidth after reorder = the slab SpMM path will be
    efficient (its slab width covers p95 of edges; the rest take the
    gather fallback)."""
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    n = len(indptr) - 1
    deg = indptr[1:] - indptr[:-1]
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    ok = indices >= 0
    d = np.abs(indices.astype(np.int64) - rows)[ok]
    if len(d) == 0:
        return {"mean": 0.0, "p50": 0, "p95": 0, "max": 0}
    return {
        "mean": float(d.mean()),
        "p50": int(np.percentile(d, 50)),
        "p95": int(np.percentile(d, percentile)),
        "max": int(d.max()),
    }
