"""Graph convolution layers (flax.linen), TPU-first.

The reference delegates all model math to PyG (SURVEY.md: "Model math is
NOT implemented here — it comes from PyG"); in the TPU framework the
convs are first-class, built on the dense fixed-fanout layout from the
sampler (MXU-friendly: every op is a batched matmul or masked reduction)
with full-graph COO variants for full-batch training.

Each conv exposes:
  __call__(x_dst, x_neigh, mask)  — sampled path; x_neigh (S, k, F) are
      pre-gathered neighbor features (gathering may be distributed and is
      the framework's job, not the layer's).
  full(x, src, dst, num_nodes)    — full-batch COO path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cugraph_gnn_tpu.ops.sddmm import fanout_attention_softmax
from cugraph_gnn_tpu.ops.spmm import fanout_aggregate, segment_spmm


class SAGEConv(nn.Module):
    """GraphSAGE convolution (mean/max/sum aggregator).

    h = W_l x_dst + W_r agg_{j in N(dst)} x_j       (PyG SAGEConv semantics)
    """

    features: int
    aggr: str = "mean"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.lin_self = nn.Dense(self.features, use_bias=self.use_bias,
                                 dtype=self.dtype, name="lin_self")
        self.lin_neigh = nn.Dense(self.features, use_bias=False,
                                  dtype=self.dtype, name="lin_neigh")

    def __call__(self, x_dst, x_neigh, mask):
        agg = fanout_aggregate(x_neigh, mask, self.aggr)
        return self.lin_self(x_dst) + self.lin_neigh(agg)

    def full(self, x, src, dst, num_nodes: int):
        agg = segment_spmm(x, src, dst, num_nodes, reduce=self.aggr)
        return self.lin_self(x[:num_nodes]) + self.lin_neigh(agg)

    def full_graph(self, x, fbg):
        """Full-batch via ops.FullBatchGraph (slab MXU path on locality
        graphs); x in fbg's graph order."""
        agg = fbg.spmm(x, reduce=self.aggr).astype(x.dtype)
        return self.lin_self(x) + self.lin_neigh(agg)


class GCNConv(nn.Module):
    """GCN convolution with symmetric normalization.

    Sampled path approximates the normalization with provided global
    degrees when available (``deg_dst``/``deg_neigh``), else mean
    aggregation (the standard minibatch GCN approximation).
    """

    features: int
    use_bias: bool = True
    add_self_loops: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.lin = nn.Dense(self.features, use_bias=self.use_bias,
                            dtype=self.dtype, name="lin")

    def __call__(self, x_dst, x_neigh, mask, deg_dst=None, deg_neigh=None):
        """deg_dst (B,) / deg_neigh (B, K): RAW global in-degrees of the
        destination / neighbor nodes (the self-loop increment is applied
        here when ``add_self_loops``, mirroring ``full``); when provided
        the layer computes the exact symmetric normalization instead of
        the mean-aggregation minibatch approximation."""
        if deg_dst is not None and deg_neigh is not None:
            inc = 1.0 if self.add_self_loops else 0.0
            dd = jnp.maximum(deg_dst + inc, 1).astype(x_neigh.dtype)
            dn = jnp.maximum(deg_neigh + inc, 1).astype(x_neigh.dtype)
            w = jax.lax.rsqrt(dd)[:, None] * jax.lax.rsqrt(dn)
            msgs = x_neigh * jnp.where(mask, w, 0)[..., None]
            agg = jnp.sum(msgs, axis=1)
            if self.add_self_loops:
                agg = agg + x_dst / dd[:, None]
        else:
            agg = fanout_aggregate(x_neigh, mask, "mean")
            if self.add_self_loops:
                n = jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None]
                agg = (agg * n + x_dst) / (n + 1).astype(agg.dtype)
        return self.lin(agg)

    def full(self, x, src, dst, num_nodes: int):
        valid = (src >= 0) & (dst >= 0)
        ones = jnp.where(valid, 1.0, 0.0).astype(x.dtype)
        safe_dst = jnp.where(valid, dst, num_nodes)
        deg = jax.ops.segment_sum(ones, safe_dst, num_segments=num_nodes + 1)[
            :num_nodes]
        if self.add_self_loops:
            deg = deg + 1
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1))
        w = jnp.where(
            valid,
            dinv[jnp.where(valid, src, 0)] * dinv[jnp.where(valid, dst, 0)],
            0.0)
        agg = segment_spmm(x, src, dst, num_nodes, reduce="sum", edge_weight=w)
        if self.add_self_loops:
            agg = agg + x[:num_nodes] * (dinv * dinv)[:, None]
        return self.lin(agg)

    def full_graph(self, x, fbg):
        """Full-batch with symmetric normalization factorized through
        the unweighted aggregate: D^-1/2 A D^-1/2 x = dinv * A(dinv*x),
        so the slab MXU path applies without baking edge weights."""
        deg = fbg.degrees.astype(jnp.float32)
        if self.add_self_loops:
            deg = deg + 1
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1))[:, None].astype(x.dtype)
        agg = (fbg.spmm(x * dinv, reduce="sum").astype(x.dtype)) * dinv
        if self.add_self_loops:
            agg = agg + x * (dinv * dinv)
        return self.lin(agg)


class GATConv(nn.Module):
    """Graph attention (GATv1) with multi-head attention.

    Sampled path scores edges with the SDDMM pattern
    (a_l^T W x_dst + a_r^T W x_src) per head, softmax over the fanout
    axis — per BASELINE.json config 3.
    """

    features: int          # per-head output features
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        h, f = self.heads, self.features
        self.lin = nn.Dense(h * f, use_bias=False, dtype=self.dtype, name="lin")
        self.att_src = self.param(
            "att_src", nn.initializers.glorot_uniform(), (1, h, f))
        self.att_dst = self.param(
            "att_dst", nn.initializers.glorot_uniform(), (1, h, f))
        if self.use_bias:
            out = h * f if self.concat else f
            self.bias = self.param("bias", nn.initializers.zeros, (out,))

    def _out(self, agg):
        # agg: (S, H, F)
        s = agg.shape[0]
        if self.concat:
            out = agg.reshape(s, self.heads * self.features)
        else:
            out = jnp.mean(agg, axis=1)
        if self.use_bias:
            out = out + self.bias
        return out

    def __call__(self, x_dst, x_neigh, mask):
        s, k, _ = x_neigh.shape
        h, f = self.heads, self.features
        wd = self.lin(x_dst).reshape(s, h, f)
        wn = self.lin(x_neigh).reshape(s, k, h, f)
        a_d = jnp.sum(wd * self.att_dst[0][None], axis=-1)           # (S, H)
        a_n = jnp.sum(wn * self.att_src[0][None, None], axis=-1)     # (S, k, H)
        e = nn.leaky_relu(a_d[:, None, :] + a_n, self.negative_slope)
        e = jnp.where(mask[..., None], e, -jnp.inf)
        # softmax over fanout axis per head
        alpha = fanout_attention_softmax(
            e.transpose(0, 2, 1).reshape(s * h, k),
            jnp.repeat(mask, h, axis=0).reshape(s * h, k),
        ).reshape(s, h, k).transpose(0, 2, 1)                        # (S, k, H)
        agg = jnp.einsum("skh,skhf->shf", alpha, wn,
                         preferred_element_type=jnp.float32).astype(wn.dtype)
        return self._out(agg)

    def full(self, x, src, dst, num_nodes: int):
        from cugraph_gnn_tpu.ops.sddmm import coo_edge_softmax
        h, f = self.heads, self.features
        wx = self.lin(x).reshape(x.shape[0], h, f)
        valid = (src >= 0) & (dst >= 0)
        s_safe = jnp.where(valid, src, 0)
        d_safe = jnp.where(valid, dst, 0)
        a_n = jnp.sum(wx * self.att_src[0][None], axis=-1)  # (N, H)
        a_d = jnp.sum(wx * self.att_dst[0][None], axis=-1)
        e = nn.leaky_relu(a_d[d_safe] + a_n[s_safe], self.negative_slope)  # (E, H)
        aggs = []
        for head in range(h):
            eh = jnp.where(valid, e[:, head], -jnp.inf)
            alpha = coo_edge_softmax(eh, jnp.where(valid, dst, -1), num_nodes)
            aggs.append(segment_spmm(
                wx[:, head, :], src, dst, num_nodes, reduce="sum",
                edge_weight=alpha))
        agg = jnp.stack(aggs, axis=1)  # (N, H, F)
        return self._out(agg)

    def full_graph(self, x, fbg):
        """Full-batch attention via the fused slab kernel (SDDMM +
        softmax + aggregate in one MXU pass over ALL heads — the
        adjacency reconstruction is amortized across heads).
        Trainable: the kernel carries a custom VJP whose backward also
        rides the banded MXU slabs (ops/pallas/slab_attn_grad.py), so
        full-batch GAT trains end-to-end on the fused path."""
        h, f = self.heads, self.features
        wx = self.lin(x).reshape(x.shape[0], h, f)
        a_n = jnp.sum(wx * self.att_src[0][None], axis=-1)  # (N, H)
        a_d = jnp.sum(wx * self.att_dst[0][None], axis=-1)
        agg = fbg.attention_spmm_mh(
            wx, a_d.astype(jnp.float32), a_n.astype(jnp.float32),
            negative_slope=self.negative_slope).astype(wx.dtype)
        return self._out(agg)


class GINConv(nn.Module):
    """Graph isomorphism network convolution (PyG GINConv semantics,
    ref cugraph_pyg/examples/dist_gin_sg.py model family):

    h = MLP((1 + eps) * x_dst + sum_{j in N(dst)} x_j)

    MLP is the standard 2-layer Dense-ReLU-Dense; ``eps`` is trainable
    when ``train_eps`` (PyG default init 0).
    """

    features: int
    hidden_features: Optional[int] = None
    train_eps: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        hid = self.hidden_features or self.features
        self.mlp_1 = nn.Dense(hid, use_bias=self.use_bias,
                              dtype=self.dtype, name="mlp_1")
        self.mlp_2 = nn.Dense(self.features, use_bias=self.use_bias,
                              dtype=self.dtype, name="mlp_2")
        if self.train_eps:
            self.eps = self.param("eps", nn.initializers.zeros, ())
        else:
            self.eps = 0.0

    def _mlp(self, z):
        return self.mlp_2(nn.relu(self.mlp_1(z)))

    def __call__(self, x_dst, x_neigh, mask):
        agg = fanout_aggregate(x_neigh, mask, "sum")
        one = jnp.asarray(1.0, agg.dtype)
        return self._mlp((one + self.eps) * x_dst + agg)

    def full(self, x, src, dst, num_nodes: int):
        agg = segment_spmm(x, src, dst, num_nodes, reduce="sum")
        one = jnp.asarray(1.0, agg.dtype)
        return self._mlp((one + self.eps) * x[:num_nodes] + agg)

    def full_graph(self, x, fbg):
        agg = fbg.spmm(x, reduce="sum").astype(x.dtype)
        one = jnp.asarray(1.0, agg.dtype)
        return self._mlp((one + self.eps) * x + agg)


class RGCNConv(nn.Module):
    """Relational GCN: per-relation transforms + root transform
    (per BASELINE.json config 4; PyG RGCNConv semantics, mean aggr per
    relation).

    Sampled hetero path: one fixed-fanout block per relation.
    """

    features: int
    num_relations: int
    aggr: str = "mean"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.lin_root = nn.Dense(self.features, use_bias=self.use_bias,
                                 dtype=self.dtype, name="lin_root")
        self.lin_rel = [
            nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name=f"lin_rel_{r}")
            for r in range(self.num_relations)
        ]

    def __call__(self, x_dst, rel_neigh):
        """rel_neigh: sequence over relations of (x_neigh (S,k,F), mask)
        tuples (None for relations absent from the batch)."""
        out = self.lin_root(x_dst)
        for r, blk in enumerate(rel_neigh):
            if blk is None:
                continue
            x_neigh, mask = blk
            agg = fanout_aggregate(x_neigh, mask, self.aggr)
            out = out + self.lin_rel[r](agg)
        return out

    def typed_call(self, x_dst, rel_neigh):
        """Typed-target-segment variant (sampler/hetero.py
        hetero_multihop_batched(dst_types=...)): relation r's block
        covers only the level's dst-type target rows, so each tuple is
        (x_neigh (S_r, k, F), mask, plan) with ``plan`` a static tuple
        of (segment_length, covered) over the level's positional
        segments — the per-relation output is placed back at its
        segment rows (zeros elsewhere).  2-tuples (full-cover blocks)
        are accepted and behave like __call__'s."""
        out = self.lin_root(x_dst)
        for r, blk in enumerate(rel_neigh):
            if blk is None:
                continue
            plan = None
            if len(blk) == 2:
                x_neigh, mask = blk
            else:
                x_neigh, mask, plan = blk
            agg = fanout_aggregate(x_neigh, mask, self.aggr)
            rel = self.lin_rel[r](agg)
            if plan is not None:
                pieces, off = [], 0
                for length, covered in plan:
                    if covered:
                        pieces.append(rel[off:off + length])
                        off += length
                    else:
                        pieces.append(jnp.zeros(
                            (length,) + rel.shape[1:], rel.dtype))
                rel = (pieces[0] if len(pieces) == 1
                       else jnp.concatenate(pieces, axis=0))
            out = out + rel
        return out

    def edgewise(self, x_dst, x_neigh, mask, edge_type):
        """Per-EDGE relation ids instead of per-relation blocks: the
        reference's FastRGCNConv consumption pattern over a homogeneous
        graph with an edge-type attribute (ref
        examples/rgcn_link_class_mnmg.py — relation looked up by the
        sampled batch's e_id).  edge_type: (S, k) int32 aligned with
        x_neigh/mask."""
        out = self.lin_root(x_dst)
        for r in range(self.num_relations):
            sel = mask & (edge_type == r)
            agg = fanout_aggregate(x_neigh, sel, self.aggr)
            out = out + self.lin_rel[r](agg)
        return out

    def full(self, x, src, dst, edge_type, num_nodes: int):
        out = self.lin_root(x[:num_nodes])
        for r in range(self.num_relations):
            sel = edge_type == r
            s_r = jnp.where(sel, src, -1)
            d_r = jnp.where(sel, dst, -1)
            agg = segment_spmm(x, s_r, d_r, num_nodes, reduce=self.aggr)
            out = out + self.lin_rel[r](agg)
        return out

    def full_graph(self, x, rfb):
        """Full-batch via ops.RelationalFullBatch: per-relation banded
        slab SpMMs on the shared union-RCM node order (each relation's
        forward AND backward ride the MXU slab kernel); x in rfb's
        graph order.  Ref analog: FastRGCNConv at
        /root/reference/python/cugraph-pyg/cugraph_pyg/examples/rgcn_link_class_mnmg.py."""
        if len(rfb.graphs) != self.num_relations:
            raise ValueError(
                f"RelationalFullBatch has {len(rfb.graphs)} relations, "
                f"conv expects {self.num_relations}")
        out = self.lin_root(x)
        for r, g in enumerate(rfb.graphs):
            agg = g.spmm(x, reduce=self.aggr).astype(x.dtype)
            out = out + self.lin_rel[r](agg)
        return out
