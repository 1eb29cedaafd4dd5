"""Link loader + negative sampling tests
(ref cugraph-pyg tests/loader negative-sampling cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader.link_loader import LinkNeighborLoader
from cugraph_gnn_tpu.sampler.negative import (
    NegativeSampling,
    make_edge_key_sorted,
    sample_negative_edges,
)


def test_negative_sampling_uniform():
    key = jax.random.PRNGKey(0)
    src, dst = sample_negative_edges(
        key, 100, 100, 500, NegativeSampling("binary", 1.0))
    src, dst = np.asarray(src), np.asarray(dst)
    assert ((src >= 0) & (src < 100)).all()
    assert ((dst >= 0) & (dst < 100)).all()
    # roughly uniform coverage
    assert len(np.unique(src)) > 70


def test_negative_sampling_rejects_true_edges():
    # dense-ish graph on 12 nodes: rejection must avoid true edges
    rng = np.random.default_rng(0)
    src = rng.integers(0, 12, 60)
    dst = rng.integers(0, 12, 60)
    ek = make_edge_key_sorted(src, dst, 12)
    s, d = sample_negative_edges(
        jax.random.PRNGKey(1), 12, 12, 400, NegativeSampling(), ek)
    s, d = np.asarray(s), np.asarray(d)
    true_keys = set((src.astype(np.int64) * 12 + dst).tolist())
    ok = s >= 0
    sampled_keys = s[ok].astype(np.int64) * 12 + d[ok]
    assert not set(sampled_keys.tolist()) & true_keys


def test_negative_sampling_weighted():
    w = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    s, d = sample_negative_edges(
        jax.random.PRNGKey(2), 4, 4, 300,
        NegativeSampling("binary", 1.0, src_weight=w, dst_weight=w))
    assert (np.asarray(s) >= 2).all()
    assert (np.asarray(d) >= 2).all()


def test_link_neighbor_loader(karate):
    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    fs = FeatureStore()
    fs[("", "x")] = np.eye(karate.num_nodes, dtype=np.float32)
    eli = np.stack([karate.src[:40], karate.dst[:40]])
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[4, 4], edge_label_index=eli,
        neg_sampling="binary", batch_size=8, shuffle=True)
    n = 0
    for batch in loader:
        n += 1
        b = 8
        assert batch.seeds.shape == (4 * b,)  # pos src|dst + neg src|dst
        assert batch.edge_label_index.shape == (2, 2 * b)
        assert batch.edge_label.shape == (2 * b,)
        lab = np.asarray(batch.edge_label)
        seeds = np.asarray(batch.seeds)
        # positive labels 1 where the pos edge is not padding
        np.testing.assert_array_equal(lab[:b], (seeds[:b] >= 0))
        assert (lab[b:] == 0).all()
        # edge_label_index points at the fixed seed layout
        eli_b = np.asarray(batch.edge_label_index)
        np.testing.assert_array_equal(eli_b[0, :b], np.arange(b))
        np.testing.assert_array_equal(eli_b[1, :b], np.arange(b) + b)
        assert batch.x is not None
    assert n == 5


def test_link_pred_end_to_end(karate):
    """Train a tiny link predictor: dot-product of SAGE embeddings."""
    import optax
    from cugraph_gnn_tpu.models import GraphSAGE

    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    fs = FeatureStore()
    fs[("", "x")] = np.eye(karate.num_nodes, dtype=np.float32)
    eli = np.stack([karate.src, karate.dst])
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[5, 5], edge_label_index=eli,
        neg_sampling="binary", batch_size=16, shuffle=True, seed=3)
    model = GraphSAGE(hidden_features=16, out_features=8, num_layers=2)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, sample, eli, label, seeds):
        def loss_fn(p):
            emb = model.apply(p, x, sample)  # (num_seeds, 8)
            s_emb = emb[eli[0]]
            d_emb = emb[eli[1]]
            score = jnp.sum(s_emb * d_emb, axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, label)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for epoch in range(8):
        for b in loader:
            params, opt, loss = step(params, opt, b.x, b.sample,
                                     b.edge_label_index, b.edge_label,
                                     b.seeds)
            losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.85, (
        losses[:5], losses[-5:])


def test_triplet_negative_mode(karate):
    """triplet: negatives share the positive sources
    (ref sampler_utils.py triplet semantics)."""
    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    fs = FeatureStore()
    eli = np.stack([karate.src[:32], karate.dst[:32]])
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[3], edge_label_index=eli,
        neg_sampling={"mode": "triplet", "amount": 2.0}, batch_size=8)
    b = next(iter(loader))
    seeds = np.asarray(b.seeds)
    pos_src = seeds[:8]
    neg_src = seeds[16:32]
    # negative sources repeat the positive sources (2 each)
    np.testing.assert_array_equal(neg_src, np.repeat(pos_src, 2))
