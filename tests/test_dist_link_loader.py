"""DistLinkNeighborLoader: edge-seeded link prediction over the
8-device CPU mesh (the multi-GPU deployment of the reference's
link_neighbor_loader, ref examples/mag_lp_mnmg.py:100-160)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import DistLinkNeighborLoader
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh

ET = ("author", "writes", "paper")


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


@pytest.fixture(scope="module")
def homo_store():
    rng = np.random.default_rng(21)
    n, e, f = 160, 2000, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    x = rng.standard_normal((n, f)).astype(np.float32)
    fs[("", "x")] = x
    return fs, gs, x, src, dst, n


def test_dist_link_loader_homogeneous(mesh, homo_store):
    fs, gs, x, src, dst, n = homo_store
    b = 16
    loader = DistLinkNeighborLoader(
        (fs, gs), [3, 3], mesh=mesh,
        edge_label_index=np.stack([src, dst]),
        neg_sampling="binary", batch_size=b, seed=5)
    in_edges = set(zip(dst.tolist(), src.tolist()))
    n_batches = 0
    for batch in loader:
        n_batches += 1
        seeds = np.asarray(batch.seeds)
        assert seeds.shape == (loader.seed_count,)
        ps, pd = seeds[:b], seeds[b:2 * b]
        valid = ps >= 0
        iid = np.asarray(batch.input_id)[valid]
        np.testing.assert_array_equal(ps[valid], src[iid])
        np.testing.assert_array_equal(pd[valid], dst[iid])
        lab = np.asarray(batch.edge_label)
        assert (lab[:b][valid] == 1).all() and (lab[b:] == 0).all()
        # negatives land in range
        ns = seeds[2 * b:2 * b + loader.num_neg]
        assert ((ns[ns >= 0] >= 0) & (ns[ns >= 0] < n)).all()
        # features match ground truth for valid sampled nodes
        inp = np.asarray(batch.sample.levels[-1])
        xb = np.asarray(batch.x)
        ok = inp >= 0
        np.testing.assert_allclose(xb[ok], x[inp[ok]], rtol=1e-6)
        # hop-0 neighbors are true in-neighbors of their (sharded) seeds
        lvl0 = np.asarray(batch.sample.levels[0]).reshape(8, -1)
        ng = np.asarray(batch.sample.hops[0].neigh_global)
        t_local = lvl0.shape[1]
        ng = ng.reshape(8, t_local, -1)
        for r in range(8):
            for i in range(t_local):
                for v in ng[r, i][ng[r, i] >= 0]:
                    assert (int(lvl0[r, i]), int(v)) in in_edges
    assert n_batches == -(-len(src) // b)


def test_dist_link_loader_hetero(mesh):
    rng = np.random.default_rng(22)
    n_p, n_a, n_w = 48, 32, 96
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, 200), rng.integers(0, n_p, 200)),
                      ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    w_src = rng.integers(0, n_a, n_w)
    w_dst = rng.integers(0, n_p, n_w)
    gs.put_edge_index((w_src, w_dst), ET, num_nodes=(n_a, n_p))
    fs = FeatureStore()
    xp = rng.standard_normal((n_p, 8)).astype(np.float32)
    xa = rng.standard_normal((n_a, 8)).astype(np.float32)
    fs[("paper", "x")] = xp
    fs[("author", "x")] = xa
    g = gs.finalize()
    off_a, off_p = g.node_offsets["author"], g.node_offsets["paper"]
    b = 16
    loader = DistLinkNeighborLoader(
        (fs, gs), [3, 3], mesh=mesh,
        edge_label_index=(ET, np.stack([w_src, w_dst])),
        neg_sampling="triplet", batch_size=b, seed=7)
    assert loader.hetero
    for batch in loader:
        seeds = np.asarray(batch.seeds)
        ps, pd = seeds[:b], seeds[b:2 * b]
        nn = loader.num_neg
        ns = seeds[2 * b:2 * b + nn]
        nd = seeds[2 * b + nn:2 * b + 2 * nn]
        for s in (ps, ns):   # sources in the author range
            ok = s >= 0
            assert ((s[ok] >= off_a) & (s[ok] < off_a + n_a)).all()
        for d in (pd, nd):   # destinations in the paper range
            ok = d >= 0
            assert ((d[ok] >= off_p) & (d[ok] < off_p + n_p)).all()
        # triplet negatives share the positive sources
        rep = np.repeat(ps, max(int(loader.neg.amount), 1))[:nn]
        ok = (ns >= 0) & (rep >= 0)
        np.testing.assert_array_equal(ns[ok], rep[ok])
        # positive pairs reproduce the typed-local edges
        valid = ps >= 0
        iid = np.asarray(batch.input_id)[valid]
        np.testing.assert_array_equal(ps[valid] - off_a, w_src[iid])
        np.testing.assert_array_equal(pd[valid] - off_p, w_dst[iid])
        # per-type feature dicts match ground truth rows
        assert set(batch.x.keys()) == {"author", "paper"}
        inp = np.asarray(batch.sample.levels[-1])
        for nt, xt, off, cnt in (("author", xa, off_a, n_a),
                                 ("paper", xp, off_p, n_p)):
            xb = np.asarray(batch.x[nt])
            ok = (inp >= off) & (inp < off + cnt)
            np.testing.assert_allclose(xb[ok], xt[inp[ok] - off], rtol=1e-6)
        break


def test_dist_link_loader_end_to_end(mesh, homo_store):
    """A dot-product link predictor trains through the distributed
    loader (sampled SAGE encoder over the sharded batch)."""
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE

    fs, gs, x, src, dst, n = homo_store
    b = 32
    loader = DistLinkNeighborLoader(
        (fs, gs), [3, 3], mesh=mesh,
        edge_label_index=np.stack([src, dst]),
        neg_sampling="binary", batch_size=b, seed=9,
        reject_true_edges=True)
    model = GraphSAGE(hidden_features=16, out_features=16, num_layers=2)

    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, sample, eli, lab, seeds):
        def loss_fn(p):
            h = model.apply(p, x, sample)
            score = jnp.sum(h[eli[0]] * h[eli[1]], axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, lab)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(4):
        for batch in loader:
            params, opt, loss = step(params, opt, batch.x, batch.sample,
                                     batch.edge_label_index,
                                     batch.edge_label, batch.seeds)
            losses.append(float(loss))
    assert np.mean(losses[-8:]) < np.mean(losses[:8]), losses
