"""dedup=False fast path must be model-equivalent to dedup=True
(same sampled edges, renumbering differs only by duplication)."""

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.models import GraphSAGE
from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.sampler import NeighborSampler


def test_dedup_false_layout_invariants(karate, rng):
    n = karate.num_nodes
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, n, sort_by="src")
    s_dedup = NeighborSampler(indptr, indices, [5, 5], dedup=True)
    s_fast = NeighborSampler(indptr, indices, [5, 5], dedup=False)
    seeds = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    b1 = s_dedup.sample(key, seeds)
    b2 = s_fast.sample(key, seeds)

    # hop 1 targets are the same seeds -> identical sampled edges
    np.testing.assert_array_equal(np.asarray(b1.hops[0].neigh_global),
                                  np.asarray(b2.hops[0].neigh_global))
    np.testing.assert_array_equal(np.asarray(b1.hops[0].edge_ids),
                                  np.asarray(b2.hops[0].edge_ids))

    # neigh_local consistency in both modes: level[neigh_local] == global
    for b in (b1, b2):
        for li, hop in enumerate(b.hops):
            lvl = np.asarray(b.levels[li + 1])
            nl = np.asarray(hop.neigh_local)
            ng = np.asarray(hop.neigh_global)
            ok = nl >= 0
            np.testing.assert_array_equal(lvl[nl[ok]], ng[ok])
            # padding is consistent
            np.testing.assert_array_equal(ng[~ok], -1)


def test_dedup_modes_equal_with_full_fanout(karate):
    """With fanout >= max degree every row aggregates its FULL in-
    neighborhood, so the model output is layout-independent: the two
    modes must agree exactly."""
    n = karate.num_nodes
    deg_max = int(np.bincount(karate.dst, minlength=n).max())
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, n, sort_by="src")
    k = deg_max
    s_dedup = NeighborSampler(indptr, indices, [k, k], dedup=True)
    s_fast = NeighborSampler(indptr, indices, [k, k], dedup=False)
    seeds = jnp.arange(8, dtype=jnp.int32)
    b1 = s_dedup.sample(jax.random.PRNGKey(0), seeds)
    b2 = s_fast.sample(jax.random.PRNGKey(0), seeds)

    x_full = jax.random.normal(jax.random.PRNGKey(1), (n, 8))
    model = GraphSAGE(hidden_features=16, out_features=4, num_layers=2)

    def feats(batch):
        inp = batch.input_nodes
        return jnp.where((inp >= 0)[:, None], x_full[jnp.clip(inp, 0)], 0)

    params = model.init(jax.random.PRNGKey(2), feats(b1), b1)
    o1 = model.apply(params, feats(b1), b1)
    o2 = model.apply(params, feats(b2), b2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=1e-5)
