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
                          edge_key_sorted: Optional[jax.Array] = None,
                          node_time: Optional[jax.Array] = None,
                          seed_time: Optional[jax.Array] = None,
                          time_retries: int = 10,
                          src: Optional[jax.Array] = None):
    """Draw ``count`` negative (src, dst) pairs.

    edge_key_sorted: optional (E, 2) int32 array of the true edges'
    (src, dst) pairs in lexicographic order (from make_edge_key_sorted);
    sampled pairs colliding with a true edge get dst re-drawn once and
    are masked out if still colliding (bounded work, no dynamic loop).
    Two int32 columns rather than a packed src*num_dst+dst scalar: with
    jax_enable_x64 off an int64 key would silently truncate to int32 and
    wrap once num_src*num_dst exceeds 2**31.

    node_time/seed_time: temporal constraint (PyG semantics, ref
    sampler_utils.py:213-311 rejection-resampling loop): negative dst d
    for a positive with seed time t must satisfy node_time[d] <= t.
    Violating draws are re-drawn up to ``time_retries`` times via a
    static lax.scan; survivors are marked -1 for callers to mask.

    src: optional pinned sources (triplet mode — corrupted destinations
    per given positive source); true-edge rejection then tests the
    ACTUAL (src, dst) pairs.  Drawn from src_weight when omitted.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if src is None:
        src = _weighted_choice(k1, num_src, (count,), config.src_weight)
    else:
        src = jnp.asarray(src, jnp.int32)
    dst = _weighted_choice(k2, num_dst, (count,), config.dst_weight)
    if node_time is not None and seed_time is not None:
        node_time = jnp.asarray(node_time)
        seed_time = jnp.broadcast_to(jnp.asarray(seed_time), (count,))

        def body(d, kk):
            bad = node_time[d] > seed_time
            redraw = _weighted_choice(kk, num_dst, (count,),
                                      config.dst_weight)
            return jnp.where(bad, redraw, d), None

        dst, _ = jax.lax.scan(body, dst, jax.random.split(k4, time_retries))
        dst = jnp.where(node_time[dst] > seed_time, -1, dst)
        src = jnp.where(dst < 0, -1, src)
    # an empty edge table means "no true edges": skip rejection outright
    # (the binary search below would gather on zero-length arrays, which
    # under jit clamps to undefined values instead of cleanly missing)
    if edge_key_sorted is not None and edge_key_sorted.shape[0] == 0:
        edge_key_sorted = None
    if edge_key_sorted is not None:
        e_src = edge_key_sorted[:, 0]
        e_dst = edge_key_sorted[:, 1]
        n_edges = e_src.shape[0]

        def is_edge(s, d):
            # lexicographic binary search over (src, dst) pairs —
            # fixed iteration count so it stays jit-compatible and
            # avoids packing into a (truncatable) scalar key.
            dd = jnp.maximum(d, 0)
            lo = jnp.zeros_like(s)
            hi = jnp.full_like(s, n_edges)
            for _ in range(max(1, int(n_edges).bit_length())):
                mid = (lo + hi) >> 1
                safe = jnp.minimum(mid, n_edges - 1)
                ks = e_src[safe]
                kd = e_dst[safe]
                less = (ks < s) | ((ks == s) & (kd < dd))
                lo = jnp.where(less, mid + 1, lo)
                hi = jnp.where(less, hi, mid)
            pos = jnp.minimum(lo, n_edges - 1)
            return ((e_src[pos] == s) & (e_dst[pos] == dd)
                    & (s >= 0) & (d >= 0))
        hit = is_edge(src, dst)
        dst2 = _weighted_choice(k3, num_dst, (count,), config.dst_weight)
        if node_time is not None and seed_time is not None:
            hit = hit & (node_time[dst2] <= seed_time)
        dst = jnp.where(hit, dst2, dst)
        still = is_edge(src, dst)
        # mark unresolved collisions invalid (-1); callers mask them
        src = jnp.where(still, -1, src)
        dst = jnp.where(still, -1, dst)
    return src, dst


def neg_cat(pos, neg, batch_size: int):
    """Interleave positive and negative blocks batch-wise: the output is
    [pos batch 0 | neg batch 0 | pos batch 1 | neg batch 1 | ...] with
    ``batch_size`` positives per batch and negatives split evenly across
    batches (ref sampler_utils.py:318-336 neg_cat)."""
    pos = jnp.asarray(pos)
    neg = jnp.asarray(neg)
    n_pos = pos.shape[0]
    n_batches = -(-n_pos // batch_size) if batch_size else 1
    if n_batches <= 1:
        return jnp.concatenate([pos, neg])
    if n_pos % n_batches == 0 and neg.shape[0] % n_batches == 0:
        p = pos.reshape((n_batches, n_pos // n_batches) + pos.shape[1:])
        n = neg.reshape((n_batches, neg.shape[0] // n_batches)
                        + neg.shape[1:])
        return jnp.concatenate([p, n], axis=1).reshape(
            (n_pos + neg.shape[0],) + pos.shape[1:])
    # uneven split: host-side chunk interleave (matches the reference's
    # tensor_split behavior — earlier batches get the extra element)
    p_parts = np.array_split(np.asarray(pos), n_batches)
    n_parts = np.array_split(np.asarray(neg), n_batches)
    out = [x for pp, nn in zip(p_parts, n_parts) for x in (pp, nn)]
    return jnp.asarray(np.concatenate(out))


def make_edge_key_sorted(src, dst, num_dst: int):
    """Lexicographically sorted (E, 2) int32 (src, dst) table for true-edge
    rejection.  num_dst is kept for signature compatibility; sorting is
    done host-side in real int64 so pairs beyond 2**31 combinations stay
    exact (the device representation is two int32 columns, never a
    packed scalar — see sample_negative_edges)."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    order = np.lexsort((dst, src))
    pairs = np.stack([src[order], dst[order]], axis=1).astype(np.int32)
    return jnp.asarray(pairs)
