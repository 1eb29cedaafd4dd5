"""API-parity modules: DistMatrix, GraphStructure, COO/CSC decoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.graph_structure import GraphStructure
from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.sampler import NeighborSampler, to_coo
from cugraph_gnn_tpu.sampler.output import to_csc
from cugraph_gnn_tpu.store.dist_matrix import DistMatrix


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


def test_dist_matrix(mesh, rng):
    e, n = 100, 40
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    m = DistMatrix.from_coo(src, dst, mesh)
    assert m.num_edges == e
    gs, gd = m.to_global()
    np.testing.assert_array_equal(gs, src)
    np.testing.assert_array_equal(gd, dst)
    # local slices tile the edges
    got_s = np.concatenate([np.asarray(m.local_src(r)) for r in range(8)])
    np.testing.assert_array_equal(got_s, src)
    # random edge gather
    eids = rng.integers(0, e, 24).astype(np.int32)
    s2, d2 = m.gather_edges(jnp.asarray(eids))
    np.testing.assert_array_equal(np.asarray(s2), src[eids])
    np.testing.assert_array_equal(np.asarray(d2), dst[eids])


def test_graph_structure_sampling(karate):
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, karate.num_nodes, sort_by="src")
    g = GraphStructure()
    g.set_csr_graph(indptr, indices)
    assert g.num_nodes == karate.num_nodes
    out = g.unweighted_sample_without_replacement_one_hop(
        np.arange(8), 5, key=jax.random.PRNGKey(0))
    assert out.neighbors.shape == (8, 5)
    batch = g.multilayer_sample_without_replacement(
        np.arange(8), [4, 4], key=jax.random.PRNGKey(1))
    assert batch.num_hops == 2

    # weighted path
    g.set_edge_attribute("weight", np.ones(len(indices), np.float32))
    w = g.weighted_sample_without_replacement_one_hop(
        np.arange(8), 5, key=jax.random.PRNGKey(2))
    assert w.neighbors.shape == (8, 5)


def test_coo_csc_decoders(karate):
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, karate.num_nodes, sort_by="src")
    sampler = NeighborSampler(indptr, indices, [4, 4])
    batch = sampler.sample(jax.random.PRNGKey(0),
                           jnp.arange(8, dtype=jnp.int32))
    coo = to_coo(batch)
    assert coo.num_sampled_nodes.shape == (3,)
    assert coo.num_sampled_edges.shape == (2,)
    # every valid coo edge: node[col] is a real neighbor slot
    node = np.asarray(coo.node)
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    ok = (row >= 0) & (col >= 0)
    assert int(ok.sum()) == int(np.asarray(coo.num_sampled_edges).sum())
    assert (node[col[ok]] >= 0).all()

    csc = to_csc(batch)
    for li, colptr in enumerate(csc.colptr):
        cnt = np.diff(np.asarray(colptr))
        m = np.asarray(batch.hops[li].mask)
        np.testing.assert_array_equal(cnt, m.sum(1))
