"""CSR/COO graph structure utilities (static-shape, jit-safe).

TPU-native replacements for the reference's graph ops
(ref cpp/src/graph_ops/csr_add_self_loop_func.cuh and the CSR layout used
by cpp/src/wholegraph_ops sampling kernels).  On TPU, CSR construction is
a sort + segment count — no atomics or hash tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CSR(NamedTuple):
    """CSR adjacency: ``indptr`` (N+1,), ``indices`` (E,), optional per-edge
    data arrays carried alongside by callers (edge ids are implicit:
    position in ``indices`` is the edge id, as in the reference where the
    sampled ``edge_gid`` is the position in the CSR col array,
    ref wholegraph_ops/unweighted_sample_without_replacement_func.cuh).
    """

    indptr: jax.Array
    indices: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.indices.shape[0]

    def degrees(self) -> jax.Array:
        return self.indptr[1:] - self.indptr[:-1]


def coo_to_csr(src, dst, num_nodes: int, sort_by: str = "src"):
    """Build CSR from COO by sort + bincount.  Returns (csr, edge_perm)
    where ``edge_perm`` maps CSR edge position -> original COO position
    (so edge attributes can be re-ordered with a gather).

    jit-safe with static shapes.
    """
    key = src if sort_by == "src" else dst
    other = dst if sort_by == "src" else src
    order = jnp.argsort(key, stable=True)
    counts = jnp.bincount(key, length=num_nodes)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    ).astype(jnp.int32)
    return CSR(indptr=indptr, indices=other[order].astype(jnp.int32)), order


def coo_to_csr_np(src, dst, num_nodes: int, sort_by: str = "src"):
    """Host (NumPy) CSR builder for data prep; mirrors :func:`coo_to_csr`."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    key = src if sort_by == "src" else dst
    other = dst if sort_by == "src" else src
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=num_nodes)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return (indptr, other[order]), order


def csr_add_self_loop(indptr, indices):
    """Insert a diagonal entry at the head of every row
    (ref cpp/src/graph_ops/csr_add_self_loop_func.cuh; python semantics at
    pylibwholegraph/torch/graph_ops.py:64-95).

    Static shapes: output has exactly N more edges than the input.
    """
    n = indptr.shape[0] - 1
    e = indices.shape[0]
    new_indptr = indptr + jnp.arange(n + 1, dtype=indptr.dtype)
    # Destination position of each old edge: shift by 1 + row index.
    row_of_edge = jnp.searchsorted(
        indptr, jnp.arange(e, dtype=indptr.dtype), side="right"
    ) - 1
    new_pos = jnp.arange(e, dtype=indptr.dtype) + 1 + row_of_edge
    out = jnp.zeros((e + n,), dtype=indices.dtype)
    out = out.at[new_indptr[:-1]].set(jnp.arange(n, dtype=indices.dtype))
    out = out.at[new_pos].set(indices)
    return new_indptr, out


def edge_mask_valid(neighbors):
    """Mask for fixed-fanout neighbor blocks padded with -1."""
    return neighbors >= 0
