"""Heterogeneous distributed sampling on the 8-device CPU mesh.

ref cugraph_pyg/sampler/distributed_sampler.py:53-94 — the
heterogeneous multi-rank variants (uniform/biased/temporal)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.sampler.hetero_dist import (
    HeteroDistGraph,
    HeteroDistNeighborSampler,
)

ET_C = ("paper", "cites", "paper")
ET_W = ("author", "writes", "paper")


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(5)
    n_p, n_a = 96, 64
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, 600), rng.integers(0, n_p, 600)),
                      ET_C, num_nodes=(n_p, n_p))
    gs.put_edge_index((rng.integers(0, n_a, 400), rng.integers(0, n_p, 400)),
                      ET_W, num_nodes=(n_a, n_p))
    return gs, n_p, n_a


def _edge_sets(gs, graph):
    """host {etype_str: set of (global_dst, global_src)} built from the
    store's COO (the sampler walks reversed edges dst->src)."""
    out = {}
    for et in graph.etypes:
        src, dst = gs.get_edge_index(et)
        st, _, dt = et
        gsrc = np.asarray(src) + graph.node_offsets[st]
        gdst = np.asarray(dst) + graph.node_offsets[dt]
        out["__".join(et)] = set(zip(gdst.tolist(), gsrc.tolist()))
    return out


def test_hetero_dist_structure(mesh, store):
    gs, n_p, n_a = store
    graph = gs.finalize()
    dg = HeteroDistGraph.from_sampling_graph(graph, mesh)
    sampler = HeteroDistNeighborSampler(dg, [3, 3])
    seeds = jnp.asarray(
        np.arange(16, dtype=np.int32) + graph.node_offsets["paper"])
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    assert batch.num_hops == 2
    edges = _edge_sets(gs, graph)
    off_p = graph.node_offsets["paper"]
    off_a = graph.node_offsets["author"]
    # neigh_local is SHARD-local (same convention as the homogeneous
    # DistNeighborSampler: consumers index within their shard's level
    # slice inside shard_map)
    levels = [np.asarray(l).reshape(8, -1) for l in batch.levels]
    for h, blocks in enumerate(batch.hops):
        assert set(blocks.keys()) == {"author__writes__paper",
                                      "paper__cites__paper"}
        t_local = levels[h].shape[1]
        for ename, blk in blocks.items():
            ng = np.asarray(blk.neigh_global).reshape(8, t_local, -1)
            nl = np.asarray(blk.neigh_local).reshape(8, t_local, -1)
            for r in range(8):
                tgt, nxt = levels[h][r], levels[h + 1][r]
                for i in range(t_local):
                    for j in range(ng.shape[2]):
                        if ng[r, i, j] < 0:
                            continue
                        # a real edge of this etype
                        assert (int(tgt[i]), int(ng[r, i, j])) in (
                            edges[ename]), (h, ename, tgt[i], ng[r, i, j])
                        # shard-local index points at the same global id
                        assert nxt[nl[r, i, j]] == ng[r, i, j]
            # type range of the sources
            flat = ng[ng >= 0]
            if ename == "author__writes__paper":
                assert ((flat >= off_a) & (flat < off_a + n_a)).all()
            else:
                assert ((flat >= off_p) & (flat < off_p + n_p)).all()
    # per-shard dedup: no duplicate valid ids within a shard's level
    for l in levels[1:]:
        for r in range(8):
            v = l[r][l[r] >= 0]
            assert len(np.unique(v)) == len(v)


def test_hetero_dist_fanout_dict_and_caps(mesh, store):
    gs, n_p, n_a = store
    graph = gs.finalize()
    dg = HeteroDistGraph.from_sampling_graph(graph, mesh)
    sampler = HeteroDistNeighborSampler(
        dg, {ET_C: [2, 2], ET_W: [4, 0]})
    seeds = jnp.asarray(
        np.arange(16, dtype=np.int32) + graph.node_offsets["paper"])
    batch = sampler.sample(jax.random.PRNGKey(1), seeds)
    assert batch.hops[0]["paper__cites__paper"].neigh_local.shape[1] == 2
    assert batch.hops[0]["author__writes__paper"].neigh_local.shape[1] == 4
    # hop 2: writes fanout 0 -> only cites block present
    assert set(batch.hops[1].keys()) == {"paper__cites__paper"}


def test_hetero_dist_weighted_and_temporal(mesh, store):
    gs, n_p, n_a = store
    graph = gs.finalize()
    rng = np.random.default_rng(9)
    # CSR-edge-order attrs for 'cites'
    n_c = int(np.asarray(graph.csr_by_etype[ET_C][0])[-1])
    w = (rng.random(n_c) + 0.1).astype(np.float32)
    times = rng.integers(0, 100, n_c).astype(np.int32)

    dg_w = HeteroDistGraph.from_sampling_graph(
        graph, mesh, weights_by_etype={ET_C: w})
    s_w = HeteroDistNeighborSampler(dg_w, [4])
    seeds = jnp.asarray(
        np.arange(16, dtype=np.int32) + graph.node_offsets["paper"])
    b = s_w.sample(jax.random.PRNGKey(2), seeds)
    base_c = graph.csr_by_etype[ET_C][2]
    e = np.asarray(b.hops[0]["paper__cites__paper"].edge_ids)
    for row in e:
        vals = row[row >= 0]
        # without-replacement + etype edge-id range
        assert len(set(vals.tolist())) == len(vals)
        assert ((vals >= base_c) & (vals < base_c + n_c)).all()

    dg_t = HeteroDistGraph.from_sampling_graph(
        graph, mesh, times_by_etype={ET_C: times})
    s_t = HeteroDistNeighborSampler(dg_t, [4])
    st = jnp.full((16,), 50, jnp.int32)
    bt = s_t.sample(jax.random.PRNGKey(3), seeds, st)
    et = np.asarray(bt.hops[0]["paper__cites__paper"].edge_ids)
    for row in et:
        for eid in row[row >= 0]:
            assert times[eid - base_c] <= 50
    # 'writes' has no time attr: unconstrained but still valid edges
    edges = _edge_sets(gs, graph)
    ngw = np.asarray(bt.hops[0]["author__writes__paper"].neigh_global)
    tgt = np.asarray(bt.levels[0])
    for i in range(ngw.shape[0]):
        for j in range(ngw.shape[1]):
            if ngw[i, j] >= 0:
                assert (int(tgt[i]), int(ngw[i, j])) in edges[
                    "author__writes__paper"]


def test_hetero_dist_pad_seeds(mesh, store):
    gs, n_p, n_a = store
    graph = gs.finalize()
    dg = HeteroDistGraph.from_sampling_graph(graph, mesh)
    sampler = HeteroDistNeighborSampler(dg, [3])
    seeds = np.full((16,), -1, np.int32)
    seeds[:5] = np.arange(5) + graph.node_offsets["paper"]
    batch = sampler.sample(jax.random.PRNGKey(4), jnp.asarray(seeds))
    for blk in batch.hops[0].values():
        ng = np.asarray(blk.neigh_global)
        assert (ng[5:] == -1).all()
    assert int(batch.seed_count) == 5
