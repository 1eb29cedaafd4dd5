"""LinkLoader / LinkNeighborLoader: edge-seeded loaders for link
prediction.

ref cugraph_pyg/loader/link_loader.py:17-230 and
link_neighbor_loader.py:20-239 — edge-seeded equivalents of the node
loaders with binary/triplet negative sampling.

TPU redesign: a batch of B positive edges (+ N negatives) yields a
fixed seed layout so one compiled program serves every step:

    seeds = [pos_src (B) | pos_dst (B) | neg_src (N) | neg_dst (N)]

``edge_label_index`` points at these fixed positions (duplicated seed
nodes are NOT deduplicated — static shapes beat the reference's
per-batch sort+unique_consecutive, ref distributed_sampler.py:428-724;
the sampler handles duplicate seeds fine).

Heterogeneous link prediction (ref examples/mag_lp_mnmg.py:100-160,
rgcn_link_class_mnmg.py): pass ``edge_label_index = (edge_type, (2, E))``
with *type-local* src/dst ids (PyG convention).  Seeds are offset into
the global hetero id space before sampling; negatives are drawn inside
the src/dst node-type ranges.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.data.feature_store import FeatureStore
from cugraph_gnn_tpu.data.graph_store import GraphStore
from cugraph_gnn_tpu.loader.node_loader import (
    build_neighbor_sampler,
    gather_node_features,
)
from cugraph_gnn_tpu.sampler.negative import (
    NegativeSampling,
    make_edge_key_sorted,
    sample_negative_edges,
)


def draw_negatives(key, ps, n_neg, num_src, num_dst, neg,
                   edge_key_sorted=None):
    """binary: independent (src, dst) corruption pairs.
    triplet: negatives share the positive sources — each positive
    source gets ``amount`` corrupted destinations
    (ref sampler_utils.py PyG triplet semantics)."""
    if neg.mode == "triplet":
        amount = max(int(neg.amount), 1)
        ns = jnp.repeat(jnp.asarray(ps, jnp.int32), amount)[:n_neg]
        # pin the positive sources so true-edge rejection tests the
        # ACTUAL (ns, nd) pairs
        ns_out, nd = sample_negative_edges(key, num_src, num_dst, n_neg,
                                           neg, edge_key_sorted, src=ns)
        # invalidate negatives whose source is padding; keep ns (the
        # rejection may mark unresolved rows -1 in ns_out)
        nd = jnp.where((ns >= 0) & (ns_out >= 0), nd, -1)
        return ns, nd
    return sample_negative_edges(key, num_src, num_dst, n_neg, neg,
                                 edge_key_sorted)


@dataclasses.dataclass
class LinkBatch:
    """One link-prediction batch."""

    sample: object                 # MultihopBatch over the seed layout
    x: Optional[jax.Array]
    edge_label_index: jax.Array    # (2, B+N) local indices into seeds
    edge_label: jax.Array          # (B+N,) 1 for positive, 0 for negative
    seeds: jax.Array               # (2B+2N,)
    input_id: jax.Array            # (B,) positions of the positive edges


class LinkLoader:
    """Edge-seeded loader (ref link_loader.py:17-230)."""

    def __init__(self, data: Tuple[FeatureStore, GraphStore], sampler,
                 edge_label_index, edge_label=None,
                 neg_sampling: Optional[NegativeSampling] = None,
                 batch_size: int = 512, shuffle: bool = False,
                 drop_last: bool = False, x_attr: str = "x",
                 reject_true_edges: bool = False, seed: int = 0,
                 edge_label_time=None):
        self.feature_store, self.graph_store = data
        self.sampler = sampler
        # per-seed-edge times (PyG edge_label_time): drives temporal
        # sampling around both endpoints (ref link_neighbor_loader.py
        # temporal configuration)
        self.edge_label_time = (None if edge_label_time is None
                                else np.asarray(edge_label_time))
        # PyG hetero form: (edge_type, (2, E)) with type-local ids.
        self.edge_type = None
        if (isinstance(edge_label_index, tuple) and len(edge_label_index) == 2
                and isinstance(edge_label_index[0], (tuple, str))):
            self.edge_type, edge_label_index = edge_label_index
        eli = np.asarray(edge_label_index)
        self.pos_src = eli[0].astype(np.int64)   # type-local ids
        self.pos_dst = eli[1].astype(np.int64)
        self.edge_label = (None if edge_label is None
                           else np.asarray(edge_label))
        self.neg = neg_sampling
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.x_attr = x_attr
        self._epoch = 0
        self._base_key = jax.random.PRNGKey(seed)
        if self.edge_type is not None:
            src_t, _, dst_t = self.edge_type
            self.src_offset = self.graph_store.node_offset(src_t)
            self.dst_offset = self.graph_store.node_offset(dst_t)
            self.num_src = self.graph_store.num_nodes(src_t)
            self.num_dst = self.graph_store.num_nodes(dst_t)
        else:
            self.src_offset = self.dst_offset = 0
            self.num_src = self.num_dst = self.graph_store.num_nodes()
        self._edge_key_sorted = None
        if reject_true_edges:
            self._edge_key_sorted = make_edge_key_sorted(
                self.pos_src, self.pos_dst, self.num_dst)

    def __len__(self):
        n = len(self.pos_src)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def _num_neg(self) -> int:
        if self.neg is None:
            return 0
        return int(self.batch_size * self.neg.amount)

    def _negatives(self, key, ps, n_neg):
        return draw_negatives(key, ps, n_neg, self.num_src, self.num_dst,
                              self.neg, self._edge_key_sorted)

    def __iter__(self) -> Iterator[LinkBatch]:
        order = np.arange(len(self.pos_src))
        if self.shuffle:
            np.random.default_rng(self._epoch + 999).shuffle(order)
        key = jax.random.fold_in(self._base_key, self._epoch)
        self._epoch += 1
        b = self.batch_size
        n_neg = self._num_neg
        for i in range(len(self)):
            sel = order[i * b: (i + 1) * b]
            ps = np.full((b,), -1, np.int64)
            pd = np.full((b,), -1, np.int64)
            ps[: len(sel)] = self.pos_src[sel]
            pd[: len(sel)] = self.pos_dst[sel]
            input_id = np.full((b,), -1, np.int64)
            input_id[: len(sel)] = sel
            kk = jax.random.fold_in(key, i)
            if n_neg:
                ns, nd = self._negatives(jax.random.fold_in(kk, 1), ps, n_neg)
            else:
                ns = jnp.zeros((0,), jnp.int32)
                nd = jnp.zeros((0,), jnp.int32)
            def _off(ids, off):
                ids = jnp.asarray(ids, jnp.int32)
                return jnp.where(ids >= 0, ids + np.int32(off), -1)

            # type-local -> global hetero id space (-1 pads stay -1)
            seeds = jnp.concatenate([
                _off(ps, self.src_offset), _off(pd, self.dst_offset),
                _off(ns, self.src_offset), _off(nd, self.dst_offset)])
            if self.edge_label_time is not None:
                # each seed slot inherits its edge's time; negatives
                # cycle the batch's VALID positive times (PyG
                # semantics — cycling the padded array would hand
                # pad-slot negatives a fabricated time).
                bt = self.edge_label_time[sel]
                fillt = bt.max() if len(bt) else 0
                t = np.full((b,), fillt, self.edge_label_time.dtype)
                t[: len(sel)] = bt
                if not n_neg:
                    neg_t = np.zeros((0,), t.dtype)
                elif self.neg is not None and self.neg.mode == "triplet":
                    # negatives repeat their positive's time (pad-slot
                    # sources are -1 and masked anyway)
                    amount = max(int(self.neg.amount), 1)
                    neg_t = np.repeat(t, amount)[:n_neg]
                elif len(bt):
                    neg_t = np.resize(bt, n_neg)  # cycles valid times
                else:
                    neg_t = np.zeros((n_neg,), t.dtype)
                times = jnp.asarray(np.concatenate([t, t, neg_t, neg_t]))
                sample = self.sampler.sample(
                    jax.random.fold_in(kk, 2), seeds, node_times=times)
            else:
                sample = self.sampler.sample(
                    jax.random.fold_in(kk, 2), seeds)
            # local positions in the seed layout
            pos_idx = jnp.stack([
                jnp.arange(b, dtype=jnp.int32),
                jnp.arange(b, dtype=jnp.int32) + b])
            neg_idx = jnp.stack([
                jnp.arange(n_neg, dtype=jnp.int32) + 2 * b,
                jnp.arange(n_neg, dtype=jnp.int32) + 2 * b + n_neg])
            eli = jnp.concatenate([pos_idx, neg_idx], axis=1)
            pos_lab = (jnp.asarray(ps) >= 0).astype(jnp.float32)
            if self.edge_label is not None:
                lab = np.zeros((b,), np.float32)
                lab[: len(sel)] = self.edge_label[sel]
                pos_lab = jnp.asarray(lab) * pos_lab
            neg_lab = jnp.zeros((n_neg,), jnp.float32)
            x = gather_node_features(
                self.feature_store, self.graph_store, self.x_attr,
                sample.input_nodes)
            yield LinkBatch(
                sample=sample, x=x, edge_label_index=eli,
                edge_label=jnp.concatenate([pos_lab, neg_lab]),
                seeds=seeds, input_id=jnp.asarray(input_id))


class LinkNeighborLoader(LinkLoader):
    """Builds the neighbor sampler from the graph store
    (ref link_neighbor_loader.py:20-239)."""

    def __init__(self, data: Tuple[FeatureStore, GraphStore],
                 num_neighbors, edge_label_index, edge_label=None,
                 neg_sampling=None, batch_size: int = 512,
                 weight_attr=None, time_attr=None, disjoint: bool = False,
                 **kwargs):
        feature_store, graph_store = data
        if time_attr is not None and kwargs.get("edge_label_time") is None:
            raise ValueError(
                "time_attr requires edge_label_time (per-seed-edge "
                "times); without it temporal sampling has no seed "
                "times and would silently run uniform")
        if time_attr is None and kwargs.get("edge_label_time") is not None:
            raise ValueError(
                "edge_label_time requires time_attr (per-edge graph "
                "times); without it the seed times are ignored and "
                "sampling would silently run uniform")
        sampler = build_neighbor_sampler(
            feature_store, graph_store, num_neighbors,
            weight_attr=weight_attr, time_attr=time_attr,
            disjoint=disjoint)
        if isinstance(neg_sampling, str):
            neg_sampling = NegativeSampling(mode=neg_sampling)
        elif isinstance(neg_sampling, dict):
            neg_sampling = NegativeSampling(**neg_sampling)
        super().__init__(data, sampler, edge_label_index,
                         edge_label=edge_label, neg_sampling=neg_sampling,
                         batch_size=batch_size, **kwargs)
