"""Disjoint sampling mode: independent per-seed subgraphs + batch
vector (PyG disjoint semantics, ref distributed_sampler.py:168-218)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.sampler import (
    DisjointNeighborSampler,
    NeighborSampler,
    to_coo_disjoint,
)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(5)
    n, e = 120, 1500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    return np.asarray(indptr), np.asarray(indices), n


def _sampler(graph, fanouts=(3, 3)):
    indptr, indices, _ = graph
    return DisjointNeighborSampler(
        NeighborSampler(indptr, indices, fanouts, dedup=True))


def test_disjoint_per_seed_subgraphs_valid(graph):
    indptr, indices, n = graph
    s = _sampler(graph)
    seeds = jnp.asarray(np.arange(16), jnp.int32)
    batch = s.sample(jax.random.PRNGKey(0), seeds)
    assert batch.levels[0].shape == (16, 1)
    for lvl_i in (1, 2):
        lvl = np.asarray(batch.levels[lvl_i])
        prev = np.asarray(batch.levels[lvl_i - 1])
        for b in range(16):
            v = lvl[b][lvl[b] >= 0]
            assert len(np.unique(v)) == len(v)          # per-seed dedup
            np.testing.assert_array_equal(               # prefix property
                lvl[b][: prev.shape[1]], prev[b])
    # every hop-0 neighbor is a true in-neighbor of its seed, via edge id
    ng = np.asarray(batch.hops[0].neigh_global)[:, 0, :]
    eid = np.asarray(batch.hops[0].edge_ids)[:, 0, :]
    for b in range(16):
        for nb, e_ in zip(ng[b], eid[b]):
            if nb < 0:
                continue
            assert indptr[b] <= e_ < indptr[b + 1]
            assert indices[e_] == nb
    # neigh_local maps into the per-seed next level
    nl = np.asarray(batch.hops[1].neigh_local)
    ngl = np.asarray(batch.hops[1].neigh_global)
    lvl2 = np.asarray(batch.levels[2])
    for b in range(16):
        m = nl[b] >= 0
        np.testing.assert_array_equal(lvl2[b][nl[b][m]], ngl[b][m])


def test_disjoint_duplicate_seeds_independent(graph):
    """The same node as two different seeds gets two independent
    subgraphs (the whole point of disjoint mode)."""
    s = _sampler(graph, fanouts=(4,))
    seeds = jnp.asarray([7, 7, 7, 7], jnp.int32)
    batch = s.sample(jax.random.PRNGKey(1), seeds)
    lvl1 = np.asarray(batch.levels[1])
    # each row is a valid subgraph of node 7; rows drawn with
    # independent RNG streams (at degree >> fanout, 4 identical draws
    # are vanishingly unlikely)
    assert all(lvl1[b][0] == 7 for b in range(4))
    assert any(not np.array_equal(lvl1[0], lvl1[b]) for b in range(1, 4))


def test_disjoint_batch_vector(graph):
    s = _sampler(graph)
    seeds_np = np.full((8,), -1, np.int32)
    seeds_np[:5] = np.arange(5)
    batch = s.sample(jax.random.PRNGKey(2), jnp.asarray(seeds_np))
    bvec = np.asarray(batch.batch)
    node = np.asarray(batch.levels[-1]).reshape(-1)
    cap = batch.levels[-1].shape[1]
    for i, (nid, b) in enumerate(zip(node, bvec)):
        if nid >= 0:
            assert b == i // cap
        else:
            assert b == -1
    # padded seeds produce empty subgraphs
    assert not np.asarray(batch.seed_valid)[5:].any()
    lvl = np.asarray(batch.levels[-1])
    assert (lvl[5:] == -1).all()


def test_disjoint_coo_blocks(graph):
    s = _sampler(graph)
    seeds = jnp.asarray(np.arange(6), jnp.int32)
    batch = s.sample(jax.random.PRNGKey(3), seeds)
    coo = to_coo_disjoint(batch)
    cap = batch.levels[-1].shape[1]
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    node = np.asarray(coo.node)
    m = row >= 0
    # rows and cols of each edge stay inside one seed's block
    np.testing.assert_array_equal(row[m] // cap, col[m] // cap)
    # col indexes resolve to the correct global ids
    edge = np.asarray(coo.edge)
    indptr, indices, _ = graph
    np.testing.assert_array_equal(node[col[m]], indices[edge[m]])


def test_disjoint_weighted_variant(graph):
    indptr, indices, n = graph
    rng = np.random.default_rng(9)
    w = rng.uniform(0.5, 1.0, len(indices)).astype(np.float32)
    zero = rng.random(len(indices)) < 0.5
    w[zero] = 0.0
    base = NeighborSampler(indptr, indices, [4], weights=w,
                           max_degree=int((indptr[1:] - indptr[:-1]).max()),
                           dedup=True)
    s = DisjointNeighborSampler(base)
    seeds = jnp.asarray(np.arange(12), jnp.int32)
    batch = s.sample(jax.random.PRNGKey(4), seeds)
    eid = np.asarray(batch.hops[0].edge_ids)[:, 0, :]
    for b in range(12):
        for e_ in eid[b][eid[b] >= 0]:
            assert w[e_] > 0


def test_disjoint_model_vmap(graph):
    """A model runs per-seed via vmap over the disjoint batch."""
    from cugraph_gnn_tpu.models import GraphSAGE

    indptr, indices, n = graph
    s = _sampler(graph)
    seeds = jnp.asarray(np.arange(8), jnp.int32)
    batch = s.sample(jax.random.PRNGKey(5), seeds)
    feats = jax.random.normal(jax.random.PRNGKey(6), (n, 16))
    x = jnp.where((batch.input_nodes >= 0)[..., None],
                  feats[jnp.clip(batch.input_nodes, 0)], 0)
    model = GraphSAGE(hidden_features=8, out_features=4, num_layers=2)
    mb = batch.per_seed()
    params = jax.vmap(
        lambda xx, bb: model.init(jax.random.PRNGKey(7), xx, bb)
    )(x, mb)
    params = jax.tree.map(lambda p: p[0], params)
    logits = jax.vmap(model.apply, in_axes=(None, 0, 0))(params, x, mb)
    assert logits.shape == (8, 1, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_disjoint_via_neighbor_loader(graph):
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader

    indptr, indices, n = graph
    rng = np.random.default_rng(13)
    # reconstruct a COO from the CSR for the store
    dst = np.repeat(np.arange(n), np.diff(indptr))
    src = indices
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = rng.standard_normal((n, 8)).astype(np.float32)
    fs[("", "y")] = (np.arange(n) % 3).astype(np.int32)
    loader = NeighborLoader((fs, gs), [3, 3], batch_size=16,
                            disjoint=True)
    batch = next(iter(loader))
    assert batch.sample.levels[-1].ndim == 2          # (B, cap)
    assert batch.x.ndim == 3                          # (B, cap, F)
    bvec = np.asarray(batch.sample.batch)
    assert (bvec[bvec >= 0] < 16).all()


def test_disjoint_hetero_per_seed_subgraphs():
    """Hetero disjoint: the vmapped per-edge-type sampler yields
    per-seed typed blocks whose local indices stay inside each seed's
    own level namespace."""
    from cugraph_gnn_tpu.data import GraphStore
    from cugraph_gnn_tpu.sampler.hetero import HeteroNeighborSampler

    rng = np.random.default_rng(9)
    n_a = n_b = 30
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_a, 300), rng.integers(0, n_b, 300)),
                      ("a", "r1", "b"), num_nodes=(n_a, n_b))
    gs.put_edge_index((rng.integers(0, n_b, 300), rng.integers(0, n_a, 300)),
                      ("b", "r2", "a"), num_nodes=(n_b, n_a))
    g = gs.finalize()
    base = HeteroNeighborSampler(g, [2, 2])
    s = DisjointNeighborSampler(base)
    seeds = jnp.asarray(np.arange(8), jnp.int32)  # global ids (type 'a')
    batch = s.sample(jax.random.PRNGKey(0), seeds)
    assert batch.levels[0].shape == (8, 1)
    # per-seed levels are deduped within each seed's namespace
    for lvl_i in range(1, 3):
        lvl = np.asarray(batch.levels[lvl_i])
        assert lvl.shape[0] == 8
        for srow in lvl:
            v = srow[srow >= 0]
            assert len(np.unique(v)) == len(v)
    # typed hop blocks: (B, S, k) with local indices inside the next
    # level's capacity, resolving to the reported global neighbor
    for hop_i, blocks in enumerate(batch.hops):
        nxt = np.asarray(batch.levels[hop_i + 1])
        for blk in blocks.values():
            nl = np.asarray(blk.neigh_local)
            ng = np.asarray(blk.neigh_global)
            assert nl.shape[0] == 8
            ok = nl >= 0
            assert nl[ok].max(initial=0) < nxt.shape[1]
            for si in range(8):
                m = ok[si]
                np.testing.assert_array_equal(
                    nxt[si][nl[si][m]], ng[si][m])


def test_disjoint_hetero_via_neighbor_loader():
    """disjoint=True on a heterogeneous NeighborLoader: per-seed typed
    subgraphs + batch vector through the loader surface (was a
    NotImplementedError; VERDICT r2 #7)."""
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader

    rng = np.random.default_rng(3)
    n_a = n_b = 40
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_a, 300),
                       rng.integers(0, n_b, 300)),
                      ("a", "r1", "b"), num_nodes=(n_a, n_b))
    gs.put_edge_index((rng.integers(0, n_b, 300),
                       rng.integers(0, n_a, 300)),
                      ("b", "r2", "a"), num_nodes=(n_b, n_a))
    fs = FeatureStore()
    fs[("a", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)
    fs[("b", "x")] = rng.standard_normal((n_b, 8)).astype(np.float32)
    fs[("a", "y")] = (np.arange(n_a) % 3).astype(np.int32)

    loader = NeighborLoader((fs, gs), [3, 3], batch_size=8,
                            input_nodes=("a", np.arange(n_a)),
                            disjoint=True)
    batch = next(iter(loader))
    lv = batch.sample.levels[-1]
    assert lv.ndim == 2 and lv.shape[0] == 8        # (B, cap)
    assert batch.sample.batch.shape == (lv.size,)
    # typed hop blocks carry the per-seed leading axis
    for blocks in batch.sample.hops:
        for blk in blocks.values():
            assert blk.neigh_local.shape[0] == 8
    # per-type features follow the per-seed layout
    assert batch.x["a"].ndim == 3 and batch.x["a"].shape[0] == 8
    # labels come from the typed seeds
    assert batch.y.shape == (8,)


def test_disjoint_hetero_via_link_loader():
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.link_loader import LinkNeighborLoader

    rng = np.random.default_rng(4)
    n_a = n_b = 40
    e = 300
    src = rng.integers(0, n_a, e)
    dst = rng.integers(0, n_b, e)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("a", "w", "b"), num_nodes=(n_a, n_b))
    fs = FeatureStore()
    fs[("a", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)
    fs[("b", "x")] = rng.standard_normal((n_b, 8)).astype(np.float32)

    loader = LinkNeighborLoader(
        (fs, gs), [3, 3],
        edge_label_index=(("a", "w", "b"), np.stack([src, dst])),
        neg_sampling="binary", batch_size=16, disjoint=True)
    batch = next(iter(loader))
    lv = batch.sample.levels[-1]
    n_seeds = batch.seeds.shape[0]
    assert lv.ndim == 2 and lv.shape[0] == n_seeds
    # every valid seed's namespace starts with the seed itself
    seeds = np.asarray(batch.seeds)
    first = np.asarray(lv[:, 0])
    ok = seeds >= 0
    np.testing.assert_array_equal(first[ok], seeds[ok])
