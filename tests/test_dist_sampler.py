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
