"""Row gather/scatter over feature matrices.

TPU-native equivalent of the reference's warp-per-row gather/scatter
kernels (ref cpp/src/wholememory_ops/functions/gather_scatter_func.cuh:23-652):
vectorized row movement with on-the-fly dtype conversion and negative-id
skip.  On TPU the single-chip case is an XLA gather (HBM-bandwidth bound
either way); a Pallas double-buffered variant lives in
ops/pallas/gather_kernel.py for when fusion with conversion wins.

The distributed (cross-chip) path — bucket by owner, all-to-all ids,
local gather, all-to-all rows back, inverse permute (ref
gather_op_impl_nccl.cu:89-157) — lives in store/dist_array.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_gather(table, ids, *, out_dtype=None, fill=0):
    """out[i] = table[ids[i]] with dtype conversion; ids < 0 -> ``fill``
    row (the reference skips negative indices, gather_scatter_func.cuh:285).
    """
    valid = ids >= 0
    rows = table[jnp.where(valid, ids, 0)]
    if out_dtype is not None and rows.dtype != out_dtype:
        rows = rows.astype(out_dtype)
    return jnp.where(valid[..., None], rows, jnp.asarray(fill, rows.dtype))


def local_scatter(table, ids, rows):
    """table[ids[i]] = rows[i]; negative ids skipped.  Functional update
    (returns new table) — callers running under donation get in-place XLA
    buffers.
    """
    valid = ids >= 0
    # Route invalid ids out of range and let mode='drop' skip them —
    # mapping them to row 0 would race with a genuine write to row 0
    # (duplicate-index set is order-nondeterministic).
    safe = jnp.where(valid, ids, table.shape[0])
    return table.at[safe].set(rows.astype(table.dtype), mode="drop",
                              unique_indices=False)


def local_scatter_add(table, ids, rows):
    """table[ids[i]] += rows[i]; negative ids skipped (gradient push)."""
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    rows = jnp.where(valid[..., None], rows.astype(table.dtype), 0)
    return table.at[safe].add(rows)
