"""Model zoo: GraphSAGE / GCN / GAT / RGCN over sampled multihop batches
and full graphs (flax.linen).

These cover BASELINE.json configs 1-4.  The reference gets these models
from PyG (ref cugraph_pyg/examples/gcn_dist_mnmg.py model setup); here
they are native, consuming the TPU-first MultihopBatch layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cugraph_gnn_tpu.models.conv import (
    GATConv,
    GCNConv,
    GINConv,
    RGCNConv,
    SAGEConv,
)
from cugraph_gnn_tpu.sampler.output import MultihopBatch


class MultihopModel(nn.Module):
    """Shared driver: run `convs` input-side-first over a MultihopBatch.

    Subclasses define ``make_convs``.  Activation arrays shrink level by
    level; levels[l] is a prefix of levels[l+1] so x_dst is a slice.
    """

    hidden_features: int = 256
    out_features: int = 64
    num_layers: int = 2
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def make_convs(self) -> Sequence[nn.Module]:
        raise NotImplementedError

    def setup(self):
        self.convs = self.make_convs()

    def __call__(self, x_input, batch: MultihopBatch, *, train: bool = False,
                 deg_input=None):
        """deg_input: optional (S_L,) RAW global in-degrees aligned with
        ``x_input`` rows (gather them like features, e.g. from a
        FeatureStore degree column).  Degree-aware convs (GCNConv) then
        compute the exact symmetric normalization per hop instead of the
        mean-aggregation minibatch approximation; degrees ride the same
        level-slicing machinery as activations."""
        h = x_input
        d = None
        if deg_input is not None:
            d = jnp.reshape(deg_input, (-1, 1)).astype(jnp.float32)
        num_hops = batch.num_hops
        assert num_hops == self.num_layers, (num_hops, self.num_layers)
        for li in range(num_hops - 1, -1, -1):
            conv = self.convs[num_hops - 1 - li]
            hop = batch.hops[li]
            # layout-aware: prefix slice / positional neighbor slice /
            # (shard-blockwise when batch.num_shards > 1, i.e. the batch
            # came from a distributed sampler whose global arrays are
            # per-shard concatenations) — see sampler/output.py.
            x_dst = batch.dst_activations(h, li)
            x_neigh = batch.gather_neighbors(h, li)
            if d is not None and isinstance(conv, GCNConv):
                d_dst = batch.dst_activations(d, li)
                d_neigh = batch.gather_neighbors(d, li)
                h = conv(x_dst, x_neigh, hop.mask,
                         d_dst[:, 0], d_neigh[..., 0])
                d = d_dst
            else:
                if d is not None:
                    d = batch.dst_activations(d, li)
                h = conv(x_dst, x_neigh, hop.mask)
            if li != 0:
                h = nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h

    def full(self, x, src, dst, num_nodes: int, *, train: bool = False):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv.full(h, src, dst, num_nodes)
            if i != len(self.convs) - 1:
                h = nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h

    def full_graph(self, x, fbg, *, train: bool = False):
        """Full-batch forward via ops.FullBatchGraph (slab MXU
        aggregation on locality graphs); x in fbg's graph order."""
        h = x
        for i, conv in enumerate(self.convs):
            h = conv.full_graph(h, fbg)
            if i != len(self.convs) - 1:
                h = nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class GraphSAGE(MultihopModel):
    aggr: str = "mean"

    def make_convs(self):
        dims = [self.hidden_features] * (self.num_layers - 1) + [self.out_features]
        return [SAGEConv(d, aggr=self.aggr, dtype=self.dtype,
                         name=f"conv_{i}")
                for i, d in enumerate(dims)]


class GCN(MultihopModel):
    def make_convs(self):
        dims = [self.hidden_features] * (self.num_layers - 1) + [self.out_features]
        return [GCNConv(d, dtype=self.dtype, name=f"conv_{i}")
                for i, d in enumerate(dims)]


class GIN(MultihopModel):
    """GIN stack (ref cugraph_pyg/examples/dist_gin_sg.py)."""

    def make_convs(self):
        dims = [self.hidden_features] * (self.num_layers - 1) + [self.out_features]
        return [GINConv(d, hidden_features=self.hidden_features,
                        dtype=self.dtype, name=f"conv_{i}")
                for i, d in enumerate(dims)]


class GAT(MultihopModel):
    heads: int = 4

    def make_convs(self):
        convs = []
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            convs.append(GATConv(
                self.out_features if last else self.hidden_features // self.heads,
                heads=1 if last else self.heads,
                concat=not last,
                name=f"conv_{i}"))
        return convs


class RGCN(nn.Module):
    """Heterogeneous R-GCN over per-relation fixed-fanout blocks
    (BASELINE.json config 4)."""

    num_relations: int = 2
    hidden_features: int = 64
    out_features: int = 16
    num_layers: int = 2

    def setup(self):
        dims = [self.hidden_features] * (self.num_layers - 1) + [self.out_features]
        self.convs = [
            RGCNConv(d, num_relations=self.num_relations, name=f"conv_{i}")
            for i, d in enumerate(dims)
        ]

    def __call__(self, x_input, rel_batches, num_shards: int = 1):
        """rel_batches: list over layers (output order matches convs) of
        per-relation [(neigh_local, mask) | None] block lists; the dst
        slice size is taken from the blocks' static shapes.  Pass
        ``num_shards=batch.num_shards`` for batches from a distributed
        sampler (shard-relative indices, see sampler/output.py)."""
        from cugraph_gnn_tpu.sampler.output import shard_gather, shard_prefix

        h = x_input
        for conv, rel_blocks in zip(self.convs, rel_batches):
            s_l = next(b[0].shape[0] for b in rel_blocks if b is not None)
            x_dst = shard_prefix(h, s_l, num_shards)
            blocks = []
            for blk in rel_blocks:
                if blk is None:
                    blocks.append(None)
                else:
                    neigh_local, mask = blk
                    blocks.append(
                        (shard_gather(h, neigh_local, num_shards), mask))
            h = conv(x_dst, blocks)
            if conv is not self.convs[-1]:
                h = nn.relu(h)
        return h

    def batch_call(self, x_input, batch, etype_names):
        """Forward directly over a HeteroMultihopBatch: neighbor
        activations read via ``batch.gather_neighbors`` — free
        contiguous slices on dedup=False static layouts (sampler/
        hetero.py), row gathers otherwise.  Relation order follows
        ``etype_names`` (must match num_relations).  Typed-segment
        layouts (4-field entries from hetero_multihop_batched's
        dst_types mode) route through RGCNConv.typed_call, which places
        each relation's aggregate at its dst-type target rows."""
        h = x_input
        num_hops = batch.num_hops
        for li, conv in enumerate(self.convs):
            hop_index = num_hops - 1 - li
            hop = batch.hops[hop_index]
            x_dst = batch.dst_activations(h, hop_index)
            entries = {e[0]: e for e in
                       (batch.layouts[hop_index] if batch.layouts
                        else ())}
            typed = False
            blocks = []
            for en in etype_names:
                if en in hop:
                    acts = batch.gather_neighbors(h, hop_index, en)
                    e = entries.get(en)
                    if e is not None and len(e) > 3:
                        typed = True
                        blocks.append((acts, hop[en].mask, e[3]))
                    else:
                        blocks.append((acts, hop[en].mask))
                else:
                    blocks.append(None)
            h = (conv.typed_call(x_dst, blocks) if typed
                 else conv(x_dst, blocks))
            if conv is not self.convs[-1]:
                h = nn.relu(h)
        return h

    def full(self, x, src, dst, edge_type, num_nodes: int):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv.full(h, src, dst, edge_type, num_nodes)
            if i != len(self.convs) - 1:
                h = nn.relu(h)
        return h

    def full_graph(self, x, rfb, *, train: bool = False):
        """Full-batch forward via ops.RelationalFullBatch (per-relation
        slab MXU aggregation); x in rfb's graph order."""
        h = x
        for i, conv in enumerate(self.convs):
            h = conv.full_graph(h, rfb)
            if i != len(self.convs) - 1:
                h = nn.relu(h)
        return h
