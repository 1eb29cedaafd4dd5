"""Edge-attribute plumbing: SamplingGraph.edge_attr_to_csr_order must
align input-order attributes with sampled edge ids, and
RGCNConv.edgewise (per-edge relation ids, the FastRGCNConv pattern)
must match the per-relation-block path."""

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.data import GraphStore


def test_edge_attr_to_csr_order_aligns_with_edge_ids():
    rng = np.random.default_rng(5)
    n, e = 40, 200
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = ("n", "e", "n")
    gs = GraphStore()
    gs.put_edge_index((src, dst), et, num_nodes=(n, n))
    g = gs.finalize()
    # attribute = input edge index; after reorder, position p holds the
    # input index of the edge at CSR position p
    order = np.asarray(g.edge_attr_to_csr_order(et, np.arange(e)))
    indptr, indices, base = g.csr_by_etype[et]
    indptr, indices = np.asarray(indptr), np.asarray(indices)
    assert base == 0
    rows = np.repeat(np.arange(n), indptr[1:] - indptr[:-1])
    cols = indices[:len(rows)]  # drop line padding
    # CSR is reversed (rows = dst); edge at CSR pos p is input edge
    # order[p], whose (dst, src) must equal (rows[p], cols[p])
    np.testing.assert_array_equal(dst[order], rows)
    np.testing.assert_array_equal(src[order], cols)


def test_rgcn_edgewise_matches_relation_blocks():
    from cugraph_gnn_tpu.models.conv import RGCNConv
    rng = np.random.default_rng(6)
    s, k, f, r_count = 12, 5, 8, 3
    x_dst = jnp.asarray(rng.standard_normal((s, f)).astype(np.float32))
    x_neigh = jnp.asarray(rng.standard_normal((s, k, f)).astype(np.float32))
    mask = jnp.asarray(rng.random((s, k)) < 0.8)
    etypes = jnp.asarray(rng.integers(0, r_count, (s, k)).astype(np.int32))

    conv = RGCNConv(16, num_relations=r_count)
    params = conv.init(jax.random.PRNGKey(0), x_dst,
                       [(x_neigh, mask)] * r_count)
    blocks = [(x_neigh, mask & (etypes == r)) for r in range(r_count)]
    want = conv.apply(params, x_dst, blocks)
    got = conv.apply(params, x_dst, x_neigh, mask, etypes,
                     method=RGCNConv.edgewise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
