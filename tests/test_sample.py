"""Sampling kernel tests vs host references — mirrors the reference's
RNG-replay strategy (ref
tests/wholegraph_torch/ops/test_wholegraph_unweighted_sample_without_replacement.py):
the device kernel and a plain-Python host implementation consume the
same uniform draws and must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.sampler.neighbor_sampler import uniform_sample_np


def make_csr(rng, num_nodes=200, num_edges=3000):
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    (indptr, indices), _ = coo_to_csr_np(src, dst, num_nodes)
    return np.asarray(indptr), np.asarray(indices)


def test_floyd_positions_matches_host(rng):
    degrees = rng.integers(0, 50, size=128)
    k = 10
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (128, k)))
    dev = np.asarray(sample_ops.floyd_positions(
        jnp.asarray(u), jnp.asarray(degrees), k))
    host = sample_ops.floyd_positions_np(u, degrees, k)
    np.testing.assert_array_equal(dev, host)


def test_floyd_no_replacement(rng):
    degrees = rng.integers(11, 500, size=256)
    k = 10
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (256, k)))
    pos = np.asarray(sample_ops.floyd_positions(
        jnp.asarray(u), jnp.asarray(degrees), k))
    for r in range(256):
        row = pos[r]
        assert len(set(row.tolist())) == k, "duplicate sample positions"
        assert (row >= 0).all() and (row < degrees[r]).all()


def test_floyd_uniformity():
    # chi^2-ish sanity: selection frequency of each position ~ k/d.
    d, k, trials = 7, 3, 4000
    degrees = np.full((trials,), d)
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (trials, k)))
    pos = np.asarray(sample_ops.floyd_positions(
        jnp.asarray(u), jnp.asarray(degrees), k))
    counts = np.bincount(pos.reshape(-1), minlength=d)
    expected = trials * k / d
    assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected)), counts


def test_uniform_sample_matches_host(rng):
    indptr, indices = make_csr(rng)
    seeds = rng.choice(200, size=64, replace=False)
    key = jax.random.PRNGKey(7)
    out = sample_ops.uniform_sample(
        key, jnp.asarray(indptr), jnp.asarray(indices), jnp.asarray(seeds), 10)
    neigh_h, eid_h = uniform_sample_np(key, indptr, indices, seeds, 10)
    np.testing.assert_array_equal(np.asarray(out.neighbors), neigh_h)
    np.testing.assert_array_equal(np.asarray(out.edge_ids), eid_h)
    deg = indptr[seeds + 1] - indptr[seeds]
    np.testing.assert_array_equal(
        np.asarray(out.num_sampled), np.minimum(deg, 10))


def test_uniform_sample_edges_belong_to_seed(rng):
    indptr, indices = make_csr(rng)
    seeds = rng.choice(200, size=32, replace=False)
    out = sample_ops.uniform_sample(
        jax.random.PRNGKey(3), jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(seeds), 5)
    eids = np.asarray(out.edge_ids)
    neigh = np.asarray(out.neighbors)
    for i, s in enumerate(seeds):
        for j in range(5):
            if eids[i, j] >= 0:
                assert indptr[s] <= eids[i, j] < indptr[s + 1]
                assert indices[eids[i, j]] == neigh[i, j]


def test_weighted_sample_validity(rng):
    indptr, indices = make_csr(rng)
    weights = rng.random(len(indices)).astype(np.float32) + 0.1
    seeds = rng.choice(200, size=64, replace=False)
    max_deg = int((indptr[1:] - indptr[:-1]).max())
    out = sample_ops.weighted_sample(
        jax.random.PRNGKey(4), jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(weights), jnp.asarray(seeds), 8, max_degree=max_deg)
    eids = np.asarray(out.edge_ids)
    deg = indptr[seeds + 1] - indptr[seeds]
    for i, s in enumerate(seeds):
        row = eids[i][eids[i] >= 0]
        assert len(row) == min(deg[i], 8)
        assert len(set(row.tolist())) == len(row)  # without replacement
        assert ((row >= indptr[s]) & (row < indptr[s + 1])).all()


def test_weighted_sample_bias():
    # Two-neighbor rows with weights (10, 1): the heavy edge should be
    # picked first far more often under fanout=1.
    n = 4000
    indptr = np.arange(0, 2 * n + 1, 2)
    indices = np.tile(np.array([1, 2]), n)
    weights = np.tile(np.array([10.0, 1.0], dtype=np.float32), n)
    seeds = np.arange(n)
    out = sample_ops.weighted_sample(
        jax.random.PRNGKey(5), jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(weights), jnp.asarray(seeds), 1, max_degree=2)
    picked = np.asarray(out.neighbors[:, 0])
    frac_heavy = (picked == 1).mean()
    assert 0.86 < frac_heavy < 0.96, frac_heavy  # expect 10/11 ≈ 0.909


def test_masked_uniform_sample_respects_filter(rng):
    indptr, indices = make_csr(rng)
    times = rng.integers(0, 100, size=len(indices)).astype(np.int32)
    seeds = rng.choice(200, size=32, replace=False)
    seed_time = np.full((32,), 50, dtype=np.int32)
    max_deg = int((indptr[1:] - indptr[:-1]).max())
    times_j = jnp.asarray(times)
    out = sample_ops.masked_uniform_sample(
        jax.random.PRNGKey(6), jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(seeds), 8, max_degree=max_deg,
        time_filter=lambda eids: times_j[eids] <= jnp.asarray(seed_time)[:, None])
    eids = np.asarray(out.edge_ids)
    for i, s in enumerate(seeds):
        row = eids[i][eids[i] >= 0]
        assert (times[row] <= 50).all()
        valid_edges = np.arange(indptr[s], indptr[s + 1])
        n_valid = (times[valid_edges] <= 50).sum()
        assert len(row) == min(n_valid, 8)


def test_capacity_budget(rng):
    """max_unique_per_hop trims level capacities (the reference's
    memory-budgeted call groups, ref distributed_sampler.py:837-875);
    overflow edges become padding but survivors stay consistent."""
    from cugraph_gnn_tpu.sampler import NeighborSampler
    indptr, indices = make_csr(rng, num_nodes=300, num_edges=6000)
    s = NeighborSampler(indptr, indices, [8, 8],
                        max_unique_per_hop=[40, 100])
    seeds = jnp.asarray(rng.choice(300, 16, replace=False), jnp.int32)
    b = s.sample(jax.random.PRNGKey(0), seeds)
    assert b.levels[1].shape[0] == 40
    assert b.levels[2].shape[0] == 100
    for li, hop in enumerate(b.hops):
        lvl = np.asarray(b.levels[li + 1])
        nl = np.asarray(hop.neigh_local)
        ng = np.asarray(hop.neigh_global)
        ok = nl >= 0
        np.testing.assert_array_equal(lvl[nl[ok]], ng[ok])


def test_edge_uniform_host_mirror():
    """edge_uniform_np must match the device hash bit-exactly
    (the weighted path's counter-based RNG; analog of the reference's
    raft-PCG host replay)."""
    key = jax.random.PRNGKey(42)
    eids = np.arange(0, 100000, 37, dtype=np.int64)
    dev = np.asarray(sample_ops._edge_uniform(key, jnp.asarray(eids)))
    host = sample_ops.edge_uniform_np(key, eids)
    np.testing.assert_array_equal(dev, host)


def test_weighted_sample_matches_host_replay(rng):
    """Exact host replay of the weighted (Gumbel top-k) selection."""
    indptr, indices = make_csr(rng, num_nodes=100, num_edges=1500)
    weights = (rng.random(len(indices)).astype(np.float32) + 0.05)
    seeds = rng.choice(100, 32, replace=False)
    k = 6
    max_deg = int((indptr[1:] - indptr[:-1]).max())
    key = jax.random.PRNGKey(11)
    out = sample_ops.weighted_sample(
        key, jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(weights), jnp.asarray(seeds), k, max_degree=max_deg)
    # host replay: same per-edge uniforms -> same gumbel scores -> top-k
    base = jax.random.fold_in(key, 0)
    for i, s in enumerate(seeds):
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        eids = np.arange(lo, hi, dtype=np.int64)
        u = sample_ops.edge_uniform_np(base, eids).astype(np.float64)
        tiny = np.float32(1.1754944e-38)
        g = -np.log(-np.log(np.maximum(u, tiny)))
        score = np.log(np.maximum(weights[lo:hi], 1e-38)) + g
        want = set((lo + np.argsort(-score)[: min(k, hi - lo)]).tolist())
        got = set(int(e) for e in np.asarray(out.edge_ids[i]) if e >= 0)
        assert got == want, (i, s, got, want)
