"""Distributed sampler over a row-sharded graph on the 8-device CPU mesh
(ref cugraph-pyg tests/sampler/test_distributed_sampler.py strategy:
structural validation of multi-rank sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.sampler.dist_sampler import DistGraph, DistNeighborSampler


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


@pytest.fixture(scope="module")
def graph(rng=None):
    rng = np.random.default_rng(42)
    n, e = 160, 2000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    return np.asarray(indptr), np.asarray(indices), n


def test_dist_graph_partitioning(mesh, graph):
    indptr, indices, n = graph
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    assert g.book.world_size == 8
    rps = g.rows_per_shard
    ip = np.asarray(g.indptr).reshape(8, rps + 1)
    ix = np.asarray(g.indices).reshape(8, -1)
    eb = np.asarray(g.edge_base)
    for r in range(8):
        lo, hi = int(g.book.offsets[r]), int(g.book.offsets[r + 1])
        expect_ip = indptr[lo:hi + 1] - indptr[lo]
        np.testing.assert_array_equal(ip[r, : hi - lo + 1], expect_ip)
        sl = indices[indptr[lo]:indptr[hi]]
        np.testing.assert_array_equal(ix[r, : len(sl)], sl)
        assert eb[r] == indptr[lo]


def test_dist_sample_one_hop_valid(mesh, graph):
    indptr, indices, n = graph
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(g, [6])
    seeds = jnp.asarray(np.arange(64) % n, jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    nbrs = np.asarray(batch.hops[0].neigh_global)
    eids = np.asarray(batch.hops[0].edge_ids)
    seeds_np = np.asarray(seeds)
    deg = indptr[seeds_np + 1] - indptr[seeds_np]
    for i, s in enumerate(seeds_np):
        row = nbrs[i][nbrs[i] >= 0]
        # count == min(deg, k)
        assert len(row) == min(deg[i], 6), (i, s, row, deg[i])
        # every sampled neighbor is a true in-neighbor, via its edge id
        es = eids[i][eids[i] >= 0]
        assert len(set(es.tolist())) == len(es)  # without replacement
        for e_, nb in zip(es, row):
            assert indptr[s] <= e_ < indptr[s + 1]
            assert indices[e_] == nb


def test_dist_sample_multihop_levels(mesh, graph):
    indptr, indices, n = graph
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(g, [4, 4])
    seeds = jnp.asarray(np.arange(32), jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(1), seeds)
    assert batch.num_hops == 2
    # levels grow with the static dedup=False layout
    assert batch.levels[1].shape[0] == 32 * 5
    assert batch.levels[2].shape[0] == 32 * 5 * 5
    # neigh_local consistency on the concatenated (global) arrays per
    # shard: verify via per-shard reshape
    lvl1 = np.asarray(batch.levels[1]).reshape(8, -1)
    nl = np.asarray(batch.hops[0].neigh_local).reshape(8, 4, -1)
    ng = np.asarray(batch.hops[0].neigh_global).reshape(8, 4, -1)
    for r in range(8):
        loc = nl[r][nl[r] >= 0]
        glob = ng[r][nl[r] >= 0]
        np.testing.assert_array_equal(lvl1[r][loc], glob)


def test_dist_sample_padded_seeds(mesh, graph):
    indptr, indices, n = graph
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(g, [3])
    seeds = np.full((32,), -1, np.int32)
    seeds[:10] = np.arange(10)
    batch = sampler.sample(jax.random.PRNGKey(2), jnp.asarray(seeds))
    assert int(batch.seed_count) == 10
    nbrs = np.asarray(batch.hops[0].neigh_global)
    assert (nbrs[np.asarray(seeds) < 0] == -1).all()


def test_dist_sample_weighted_zero_weight_excluded(mesh, graph):
    indptr, indices, n = graph
    rng = np.random.default_rng(7)
    # half the edges get weight 0 -> must never be sampled
    w = rng.uniform(0.5, 2.0, len(indices)).astype(np.float32)
    zero = rng.random(len(indices)) < 0.5
    w[zero] = 0.0
    g = DistGraph.from_global_csr(indptr, indices, mesh, weights=w)
    sampler = DistNeighborSampler(g, [5])
    seeds = jnp.asarray(np.arange(64) % n, jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(3), seeds)
    eids = np.asarray(batch.hops[0].edge_ids)
    nbrs = np.asarray(batch.hops[0].neigh_global)
    seeds_np = np.asarray(seeds)
    pos_deg = np.array([np.sum(w[indptr[s]:indptr[s + 1]] > 0)
                        for s in seeds_np])
    for i, s in enumerate(seeds_np):
        es = eids[i][eids[i] >= 0]
        assert len(es) == min(pos_deg[i], 5)
        for e_, nb in zip(es, nbrs[i][eids[i] >= 0]):
            assert indptr[s] <= e_ < indptr[s + 1]
            assert indices[e_] == nb
            assert w[e_] > 0


def test_dist_sample_temporal_filter(mesh, graph):
    indptr, indices, n = graph
    rng = np.random.default_rng(8)
    times = rng.integers(0, 100, len(indices)).astype(np.int32)
    g = DistGraph.from_global_csr(indptr, indices, mesh, times=times)
    sampler = DistNeighborSampler(g, [4])
    seeds = jnp.asarray(np.arange(64) % n, jnp.int32)
    seed_time = jnp.asarray(rng.integers(0, 100, 64).astype(np.int32))
    batch = sampler.sample(jax.random.PRNGKey(4), seeds, seed_time)
    eids = np.asarray(batch.hops[0].edge_ids)
    st = np.asarray(seed_time)
    seeds_np = np.asarray(seeds)
    for i, s in enumerate(seeds_np):
        es = eids[i][eids[i] >= 0]
        valid_deg = np.sum(times[indptr[s]:indptr[s + 1]] <= st[i])
        assert len(es) == min(valid_deg, 4), (i, s)
        for e_ in es:
            assert times[e_] <= st[i]


def test_dist_sample_dedup_levels_unique(mesh, graph):
    indptr, indices, n = graph
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(g, [4, 4], dedup=True)
    seeds = jnp.asarray(np.arange(32), jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(5), seeds)
    # per-shard levels: valid ids unique, targets a prefix
    for lvl_i in (1, 2):
        lvl = np.asarray(batch.levels[lvl_i]).reshape(8, -1)
        prev = np.asarray(batch.levels[lvl_i - 1]).reshape(8, -1)
        for r in range(8):
            v = lvl[r][lvl[r] >= 0]
            assert len(np.unique(v)) == len(v), (lvl_i, r)
            np.testing.assert_array_equal(
                lvl[r][: prev.shape[1]], prev[r])
    # neigh_local maps into the next level correctly per shard
    lvl1 = np.asarray(batch.levels[1]).reshape(8, -1)
    nl = np.asarray(batch.hops[0].neigh_local).reshape(8, 4, -1)
    ng = np.asarray(batch.hops[0].neigh_global).reshape(8, 4, -1)
    for r in range(8):
        m = nl[r] >= 0
        np.testing.assert_array_equal(lvl1[r][nl[r][m]], ng[r][m])
    # dedup vs no-dedup sample the same edges given the same key (the
    # per-hop kernels see identical targets through hop 0)
    batch2 = DistNeighborSampler(g, [4, 4]).sample(
        jax.random.PRNGKey(5), seeds)
    np.testing.assert_array_equal(
        np.asarray(batch.hops[0].edge_ids),
        np.asarray(batch2.hops[0].edge_ids))
