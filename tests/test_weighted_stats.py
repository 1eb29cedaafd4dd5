"""Statistical tests that WEIGHTS actually bias the hetero/distributed
sampling paths (round 5 / VERDICT r4 weak #6): the prior tests asserted
only structure (valid ids, no replacement), which passes even if the
weight plumbing drops the weights.  These fail decisively under uniform
sampling.

- HeteroDistNeighborSampler: a dominant-weight neighbor must be
  included with near-certainty at fanout 2 of 8 (uniform would include
  it 25% of the time).
- DistNeighborLoader (homogeneous weight_attr path): fanout-1 draw
  frequencies must follow w/sum(w) (first Gumbel draw is exactly
  proportional); chi-square against the weighted law with a uniform-
  sampling rejection margin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader.dist_loader import DistNeighborLoader
from cugraph_gnn_tpu.parallel import STORE_AXIS
from cugraph_gnn_tpu.sampler.hetero_dist import (
    HeteroDistGraph,
    HeteroDistNeighborSampler,
)

W = 8
ET_W = ("author", "writes", "paper")


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:W]), (STORE_AXIS,))


def test_hetero_dist_weighted_biases_distribution(mesh):
    """Every paper has 8 author in-neighbors; author j = p*8 + j.
    Neighbor j = 3 carries weight 100, the rest 1e-3: at fanout 2 the
    heavy neighbor must be sampled ~always (uniform: 25%)."""
    n_p, k = 64, 8
    n_a = n_p * k
    gs = GraphStore()
    authors = np.arange(n_p * k, dtype=np.int64)
    papers = np.repeat(np.arange(n_p, dtype=np.int64), k)
    gs.put_edge_index((authors, papers), ET_W, num_nodes=(n_a, n_p))
    graph = gs.finalize()
    indptr, indices, base = graph.csr_by_etype[ET_W]
    off_a = graph.node_offsets["author"]
    # weights in CSR edge order, derived from the neighbor's j
    j_of_edge = (np.asarray(indices)[: n_p * k] - off_a) % k
    w_csr = np.where(j_of_edge == 3, 100.0, 1e-3).astype(np.float32)
    dg = HeteroDistGraph.from_sampling_graph(
        graph, mesh, weights_by_etype={ET_W: w_csr})
    sampler = HeteroDistNeighborSampler(dg, {ET_W: [2]})
    seeds = jnp.asarray(np.arange(n_p, dtype=np.int32)
                        + graph.node_offsets["paper"])
    hits = trials = 0
    for t in range(20):
        b = sampler.sample(jax.random.PRNGKey(t), seeds)
        ng = np.asarray(b.hops[0]["author__writes__paper"].neigh_global)
        seeds_np = np.asarray(b.levels[0])
        for i, p in enumerate(seeds_np):
            if p < 0:
                continue
            row = ng[i][ng[i] >= 0]
            if len(row) == 0:
                continue
            trials += 1
            jrow = (row - off_a) % k
            prow = (row - off_a) // k
            # neighbors must belong to this paper
            assert (prow == p - graph.node_offsets["paper"]).all()
            hits += int((jrow == 3).any())
    assert trials >= 500
    freq = hits / trials
    # weighted: ~1.0; uniform: ~0.25
    assert freq > 0.8, f"heavy-neighbor inclusion {freq:.3f} — weights ignored?"


def test_dist_loader_weight_attr_chi_square(mesh):
    """Homogeneous weight_attr path through DistNeighborLoader: node i's
    in-neighbors are (i+1+j) % n for j in 0..7 with weight j+1; fanout 1
    frequencies must match (j+1)/36."""
    n, k = 256, 8
    src = np.concatenate([(np.arange(n) + 1 + j) % n for j in range(k)])
    dst = np.tile(np.arange(n), k)
    w = np.concatenate([np.full(n, j + 1.0, np.float32)
                        for j in range(k)])
    gs = GraphStore()
    gs.put_edge_index((src.astype(np.int64), dst.astype(np.int64)),
                      ("", "to", ""), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "w")] = w
    fs[("", "x")] = np.random.default_rng(0).standard_normal(
        (n, 4)).astype(np.float32)

    counts = np.zeros(k, np.int64)
    for seed in range(6):
        loader = DistNeighborLoader(
            (fs, gs), [1], mesh=mesh, input_nodes=np.arange(n),
            batch_size=64, weight_attr="w", seed=seed, shuffle=True)
        for batch in loader:
            ng = np.asarray(batch.sample.hops[0].neigh_global)
            seeds_np = np.asarray(batch.sample.levels[0])
            for i, s in enumerate(seeds_np):
                if s < 0:
                    continue
                row = ng[i][ng[i] >= 0]
                for nb in row:
                    j = int((nb - s - 1) % n)
                    assert 0 <= j < k
                    counts[j] += 1
    total = counts.sum()
    assert total >= 1000
    p_w = (np.arange(k) + 1) / 36.0
    expected = total * p_w
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # 7 dof: p=1e-5 at ~35.  Uniform sampling gives chi2 ~ total*0.42
    # (>400 at total=1000) — decisive either way.
    assert chi2 < 35.0, (
        f"chi2 {chi2:.1f}, counts {counts.tolist()} — weighted law violated")
