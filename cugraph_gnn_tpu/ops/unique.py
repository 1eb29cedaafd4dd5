"""Sort-based append-unique / renumbering ops.

TPU-native replacement for the reference's hash-table append_unique
(ref cpp/src/graph_ops/append_unique_func.cuh:1-342; semantics documented
at pylibwholegraph/torch/graph_ops.py:20-32): given target (seed) nodes
and raw neighbor nodes, produce a unique node list whose first
``len(targets)`` entries are the targets in order, followed by the unique
non-target neighbors; plus a mapping raw-neighbor -> position in the
unique list.

Hash tables are hostile to TPU vector units; sorts are not.  We use
``jnp.unique(..., size=...)`` (static bound) + ``searchsorted``.  All
shapes are static; unused slots are filled with -1 / count reported
separately.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AppendUniqueOutput(NamedTuple):
    unique_nodes: jax.Array   # (max_unique,) int32, -1 padded
    num_unique: jax.Array     # () int32 — valid prefix length
    neighbor_map: jax.Array   # raw neighbors -> index into unique_nodes


def append_unique(targets, neighbors, *, max_unique: int):
    """targets: (T,) unique node ids (no -1); neighbors: (R,) ids, may
    contain -1 padding and duplicates.  max_unique: static output bound
    (callers use T + R as a safe bound, or a tighter budget).

    Returns unique list = [targets..., unique new neighbors...] and for
    every raw neighbor its position in that list (-1 where neighbor
    padding).  Mirrors graph_append_unique (ref graph_op.h:27-37).
    """
    t = targets.shape[0]
    targets = targets.astype(jnp.int32)
    neighbors = neighbors.astype(jnp.int32)

    # Sort targets once for membership tests (targets are unique by contract).
    t_sorted = jnp.sort(targets)
    t_rank = jnp.argsort(targets)  # position in t_sorted -> original position
    # For a value v, its original target index (if present):
    def target_index(v):
        pos = jnp.searchsorted(t_sorted, v)
        pos = jnp.clip(pos, 0, t - 1)
        hit = t_sorted[pos] == v
        return jnp.where(hit, t_rank[pos], -1)

    is_pad = neighbors < 0
    tgt_idx = target_index(neighbors)
    is_new = (tgt_idx < 0) & ~is_pad

    # Unique over the new neighbors only; jnp.unique(size=) pads with
    # fill_value and sorts ascending.
    masked = jnp.where(is_new, neighbors, jnp.int32(2**31 - 1))
    budget = max(max_unique - t, 1)
    uniq = jnp.unique(masked, size=budget, fill_value=jnp.int32(2**31 - 1))
    valid_new = uniq != jnp.int32(2**31 - 1)
    num_new = jnp.sum(valid_new).astype(jnp.int32)
    uniq_clean = jnp.where(valid_new, uniq, -1)

    unique_nodes = jnp.concatenate([targets, uniq_clean])[:max_unique]
    num_unique = (t + num_new).astype(jnp.int32)

    # Map each raw neighbor: targets -> their index; new -> t + rank in uniq.
    new_pos = jnp.searchsorted(uniq, neighbors)
    new_pos = jnp.clip(new_pos, 0, budget - 1)
    new_ok = (uniq[new_pos] == neighbors) & is_new
    neighbor_map = jnp.where(
        is_pad, -1, jnp.where(tgt_idx >= 0, tgt_idx, jnp.where(new_ok, t + new_pos, -1))
    ).astype(jnp.int32)

    return AppendUniqueOutput(unique_nodes, num_unique, neighbor_map)


def append_unique_np(targets, neighbors):
    """Host reference implementation (ragged, exact) used by tests —
    mirrors the reference's host reference in
    python/pylibwholegraph/.../test_utils/test_comm.py.
    """
    targets = np.asarray(targets)
    neighbors = np.asarray(neighbors)
    neighbors = neighbors[neighbors >= 0]
    tset = set(targets.tolist())
    extra = np.unique(neighbors[~np.isin(neighbors, targets)])
    unique_nodes = np.concatenate([targets, np.sort(extra)]).astype(np.int64)
    lookup = {int(v): i for i, v in enumerate(unique_nodes)}
    neighbor_map = np.array([lookup[int(v)] for v in neighbors], dtype=np.int64)
    return unique_nodes, neighbor_map
