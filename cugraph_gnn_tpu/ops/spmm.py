"""SpMM: sparse (graph) × dense (features) aggregation.

The reference delegates message passing to PyG; here it is first-class
(per BASELINE.json north star: "CSR/COO graph store in TPU HBM with
Pallas gather/scatter SpMM (mean/sum/max)").

Two layouts, matching how graphs appear in the pipeline:

1. **Fixed-fanout (ELL) blocks** ``neighbors (S, k)`` from the sampler —
   the hot training path.  Aggregation is a dense gather + masked
   reduction over the fanout axis: pure MXU/VPU food, zero raggedness.
2. **Sorted-COO / CSR segments** for full-batch graphs — `segment_sum`
   (XLA scatter-add) fallback, with a Pallas kernel for the
   gather+reduce fusion in ops/pallas/spmm_kernel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Fixed-fanout (sampled) aggregation
# ---------------------------------------------------------------------------


def fanout_aggregate(x_neigh, mask, reduce: str = "mean"):
    """Aggregate neighbor features over the fanout axis.

    x_neigh: (S, k, F) gathered neighbor features (padded rows arbitrary).
    mask:    (S, k) bool validity.
    reduce:  'sum' | 'mean' | 'max'.
    Returns (S, F).
    """
    m = mask[..., None]
    if reduce == "sum":
        return jnp.sum(jnp.where(m, x_neigh, 0), axis=1)
    if reduce == "mean":
        s = jnp.sum(jnp.where(m, x_neigh, 0), axis=1)
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        return s / n.astype(s.dtype)
    if reduce == "max":
        neg = jnp.asarray(jnp.finfo(x_neigh.dtype).min, x_neigh.dtype)
        r = jnp.max(jnp.where(m, x_neigh, neg), axis=1)
        # Rows with zero valid neighbors -> 0 (SAGE convention).
        any_valid = jnp.any(mask, axis=1, keepdims=True)
        return jnp.where(any_valid, r, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


# ---------------------------------------------------------------------------
# Segment (COO/CSR) aggregation
# ---------------------------------------------------------------------------


def segment_spmm(x, src, dst, num_out: int, reduce: str = "mean",
                 edge_weight: Optional[jax.Array] = None,
                 indices_are_sorted: bool = False):
    """out[d] = reduce_{e: dst[e]=d} (w_e * x[src[e]]).

    Pure-XLA path (scatter-add); works on any backend.  -1 entries in
    ``src``/``dst`` are treated as padding and ignored.
    """
    valid = (src >= 0) & (dst >= 0)
    s = jnp.where(valid, src, 0)
    d = jnp.where(valid, dst, num_out)  # route pad to an overflow bucket
    msgs = x[s]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None].astype(msgs.dtype)
    if reduce in ("sum", "mean"):
        msgs = jnp.where(valid[:, None], msgs, 0)
        out = jax.ops.segment_sum(
            msgs, d, num_segments=num_out + 1,
            indices_are_sorted=indices_are_sorted)[:num_out]
        if reduce == "mean":
            ones = jnp.where(valid, 1, 0).astype(x.dtype)
            cnt = jax.ops.segment_sum(
                ones, d, num_segments=num_out + 1,
                indices_are_sorted=indices_are_sorted)[:num_out]
            out = out / jnp.maximum(cnt, 1)[:, None]
        return out
    if reduce == "max":
        neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
        msgs = jnp.where(valid[:, None], msgs, neg)
        out = jax.ops.segment_max(
            msgs, d, num_segments=num_out + 1,
            indices_are_sorted=indices_are_sorted)[:num_out]
        return jnp.where(jnp.isfinite(out), out, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


def csr_spmm(indptr, indices, x, reduce: str = "mean",
             edge_weight: Optional[jax.Array] = None):
    """out[r] = reduce over CSR row r of x[indices].  XLA path: expand to
    sorted COO (dst = row id per edge is already sorted by construction)
    then segment reduce.
    """
    n = indptr.shape[0] - 1
    e = indices.shape[0]
    row_of_edge = (
        jnp.searchsorted(indptr, jnp.arange(e, dtype=indptr.dtype), side="right") - 1
    ).astype(jnp.int32)
    return segment_spmm(
        x, indices, row_of_edge, n, reduce=reduce, edge_weight=edge_weight,
        indices_are_sorted=True)
