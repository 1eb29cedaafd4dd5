"""Disjoint sampling: independent per-seed subgraphs (PyG
``disjoint=True`` semantics).

ref cugraph_pyg/sampler/distributed_sampler.py:168-218 (disjoint batch
offsets: each seed's sampled nodes are renumbered into its own
namespace, and a ``batch`` vector maps every output node to its seed)
and the decoder support in cugraph_pyg/sampler/sampler.py.  Link
prediction and contrastive workloads need this mode: shared
neighborhoods would leak information between the per-seed subgraphs.

TPU design: ``jax.vmap`` of the single-seed multihop body — one
(B, cap_l) array per level instead of ragged per-seed lists.  Each seed
draws its own RNG stream (split keys), runs the same dedup'd hop loop
the batched sampler uses (append-unique with static capacities), and
the vmapped result is the disjoint batch: levels[l][s] are seed s's
unique nodes, hops[l][s] its fanout block.  A node reached from two
different seeds appears once *per seed* — exactly the PyG contract.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.sampler.neighbor_sampler import NeighborSampler
from cugraph_gnn_tpu.sampler.output import COOSample, HopBlock, MultihopBatch


class DisjointBatch(NamedTuple):
    """Vmapped multihop batch: per-seed leading axis B on every array.

    levels[l]: (B, cap_l) global node ids, -1 pad; levels[l][s] has the
      prefix property of MultihopBatch per seed.
    level_counts[l]: (B,) valid counts per seed.
    hops[l]: HopBlock of (B, S_l, k_l) arrays; neigh_local indexes into
      levels[l+1][s] (the per-seed namespace).
    seed_valid: (B,) bool — False for -1-padded seeds.
    """

    levels: List[jax.Array]
    level_counts: List[jax.Array]
    hops: List[HopBlock]
    seed_valid: jax.Array

    @property
    def num_hops(self) -> int:
        return len(self.hops)

    @property
    def input_nodes(self):
        """(B, cap_L) per-seed node lists (feature-gather targets)."""
        return self.levels[-1]

    @property
    def batch(self):
        """(B * cap_L,) seed index of every flattened node, -1 on pads —
        the PyG ``batch`` vector over ``input_nodes.reshape(-1)``."""
        b, cap = self.levels[-1].shape
        seed_of = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, cap))
        return jnp.where(self.levels[-1] >= 0, seed_of, -1).reshape(-1)

    def per_seed(self) -> MultihopBatch:
        """View as a MultihopBatch of per-seed arrays for use under
        ``jax.vmap`` (e.g. ``jax.vmap(model.apply, (None, 0, 0))``)."""
        return MultihopBatch(
            levels=list(self.levels),
            level_counts=list(self.level_counts),
            hops=list(self.hops),
            seed_count=self.seed_valid.astype(jnp.int32))


jax.tree_util.register_pytree_node(
    DisjointBatch,
    lambda b: ((b.levels, b.level_counts, b.hops, b.seed_valid), None),
    lambda _, c: DisjointBatch(*c),
)


class DisjointNeighborSampler:
    """Disjoint-mode wrapper: vmaps a dedup'd sampler over the seed
    axis.  Supports every variant the base sampler does (uniform /
    weighted / temporal — weights and edge_times carry over), and the
    heterogeneous per-edge-type sampler (whose ``_sample`` shares the
    functional signature): hops are then per-etype dicts of (B, S, k)
    blocks and ``levels`` per-seed typed-global id lists."""

    def __init__(self, base,
                 max_unique_per_hop: Optional[Sequence[int]] = None):
        if isinstance(base, NeighborSampler) and not base.dedup:
            raise ValueError("disjoint mode requires a dedup=True sampler "
                             "(per-seed namespaces are dedup'd node lists)")
        self.base = base
        self.max_unique_per_hop = max_unique_per_hop
        if max_unique_per_hop is not None:
            # the per-seed bodies run base._sample(batch_size=1), whose
            # level capacities come from the base's own knob — route the
            # wrapper's caps there so they actually apply
            base.max_unique_per_hop = [int(x) for x in max_unique_per_hop]

    def sample(self, key, seeds, node_times=None) -> DisjointBatch:
        b = seeds.shape[0]
        keys = jax.random.split(key, b)

        def per_seed(k, s, t):
            mb = self.base._sample(
                k, s[None], None if t is None else t[None], batch_size=1)
            return mb

        axes = (0, 0, None if node_times is None else 0)
        mb = jax.vmap(per_seed, in_axes=axes)(keys, seeds, node_times)
        return DisjointBatch(
            levels=list(mb.levels),
            level_counts=[c.astype(jnp.int32) for c in mb.level_counts],
            hops=list(mb.hops),
            seed_valid=seeds >= 0)


def to_coo_disjoint(batch: DisjointBatch) -> COOSample:
    """Flatten to PyG-style COO over the disjoint node list.

    node[s * cap_L + i] = levels[-1][s, i]; row/col index into that
    flattened list (each seed's indices offset by s * cap_L).  Use
    ``batch.batch`` for the seed-of-node vector.  ref disjoint COO
    layout: cugraph_pyg/sampler/sampler.py renumbering with batch
    offsets (distributed_sampler.py:168-218)."""
    bsz, cap_l = batch.levels[-1].shape
    base = (jnp.arange(bsz, dtype=jnp.int32) * cap_l)[:, None, None]
    rows, cols, edges, n_edges = [], [], [], []
    for hop in batch.hops:
        _, s, k = hop.neigh_local.shape
        dst_local = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[None, :, None], (bsz, s, k))
        m = hop.neigh_local >= 0
        rows.append(jnp.where(m, dst_local + base, -1).reshape(-1))
        cols.append(jnp.where(m, hop.neigh_local + base, -1).reshape(-1))
        edges.append(jnp.where(m, hop.edge_ids, -1).reshape(-1))
        n_edges.append(jnp.sum(m).astype(jnp.int32))
    counts = [jnp.sum(batch.level_counts[0])] + [
        jnp.sum(batch.level_counts[i + 1] - batch.level_counts[i])
        for i in range(len(batch.hops))
    ]
    return COOSample(
        node=batch.levels[-1].reshape(-1),
        row=jnp.concatenate(rows),
        col=jnp.concatenate(cols),
        edge=jnp.concatenate(edges),
        num_sampled_nodes=jnp.stack(counts),
        num_sampled_edges=jnp.stack(n_edges),
    )
