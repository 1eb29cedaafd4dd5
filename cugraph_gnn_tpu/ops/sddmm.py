"""SDDMM: sampled dense–dense products on graph edges (attention scores).

Per BASELINE.json north star — SDDMM for GAT attention.  The reference
has no SDDMM (model math lives in PyG); here the op is first-class.

Layouts mirror ops/spmm.py: fixed-fanout (S, k) blocks for sampled
training, COO for full-batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fanout_sddmm(x_dst, x_neigh, mask):
    """Edge scores e[s, j] = <x_dst[s], x_neigh[s, j]> for fixed-fanout
    neighbor blocks.  x_dst: (S, F); x_neigh: (S, k, F); mask: (S, k).
    Returns (S, k) with -inf on padding (softmax-ready).
    """
    e = jnp.einsum("sf,skf->sk", x_dst, x_neigh,
                   preferred_element_type=jnp.float32)
    return jnp.where(mask, e, -jnp.inf)


def fanout_attention_softmax(scores, mask):
    """Masked softmax over the fanout axis; rows with no valid neighbor
    get all-zero weights."""
    m = jnp.max(jnp.where(mask, scores, -jnp.inf), axis=1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0)
    p = jnp.where(mask, jnp.exp(scores - m), 0)
    z = jnp.sum(p, axis=1, keepdims=True)
    return p / jnp.maximum(z, 1e-16)


def coo_sddmm(x_src, x_dst, src, dst):
    """Edge scores e_i = <x_src[src_i], x_dst[dst_i]> for COO edges;
    -1 entries are padding -> score 0."""
    valid = (src >= 0) & (dst >= 0)
    a = x_src[jnp.where(valid, src, 0)]
    b = x_dst[jnp.where(valid, dst, 0)]
    e = jnp.sum(a * b, axis=-1)
    return jnp.where(valid, e, 0)


def coo_edge_softmax(scores, dst, num_nodes: int):
    """Per-destination softmax over COO edge scores (segment softmax)."""
    valid = dst >= 0
    d = jnp.where(valid, dst, num_nodes)
    seg_max = jax.ops.segment_max(
        jnp.where(valid, scores, -jnp.inf), d, num_segments=num_nodes + 1)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    p = jnp.where(valid, jnp.exp(scores - seg_max[d]), 0)
    z = jax.ops.segment_sum(p, d, num_segments=num_nodes + 1)
    return p / jnp.maximum(z[d], 1e-16)
