"""Heterogeneous link prediction through LinkNeighborLoader.

ref examples/mag_lp_mnmg.py:100-160 and rgcn_link_class_mnmg.py — edge
seeds of one typed relation, negatives drawn inside the src/dst node
types, RGCN encoder + dot-product decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import LinkNeighborLoader
from cugraph_gnn_tpu.models import RGCN

ET = ("author", "writes", "paper")


@pytest.fixture(scope="module")
def hetero_lp_store():
    rng = np.random.default_rng(11)
    n_p, n_a, n_w = 40, 25, 120
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, 150), rng.integers(0, n_p, 150)),
                      ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    w_src = rng.integers(0, n_a, n_w)
    w_dst = rng.integers(0, n_p, n_w)
    gs.put_edge_index((w_src, w_dst), ET, num_nodes=(n_a, n_p))
    fs = FeatureStore()
    fs[("paper", "x")] = rng.standard_normal((n_p, 8)).astype(np.float32)
    fs[("author", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)
    return fs, gs, n_p, n_a, (w_src, w_dst)


def test_hetero_link_loader_structure(hetero_lp_store):
    fs, gs, n_p, n_a, (w_src, w_dst) = hetero_lp_store
    g = gs.finalize()
    off_a = g.node_offsets["author"]
    off_p = g.node_offsets["paper"]
    b = 16
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[3, 3],
        edge_label_index=(ET, np.stack([w_src, w_dst])),
        neg_sampling="binary", batch_size=b, shuffle=True)
    n_batches = 0
    for batch in loader:
        n_batches += 1
        seeds = np.asarray(batch.seeds)
        assert seeds.shape == (4 * b,)
        ps, pd, ns, nd = (seeds[:b], seeds[b:2 * b],
                          seeds[2 * b:3 * b], seeds[3 * b:])
        for s in (ps, ns):   # source seeds live in the author range
            ok = s >= 0
            assert ((s[ok] >= off_a) & (s[ok] < off_a + n_a)).all()
        for d in (pd, nd):   # destination seeds live in the paper range
            ok = d >= 0
            assert ((d[ok] >= off_p) & (d[ok] < off_p + n_p)).all()
        # positive pairs reproduce true (typed-local) edges
        valid = ps >= 0
        iid = np.asarray(batch.input_id)[valid]
        assert (ps[valid] - off_a == w_src[iid]).all()
        assert (pd[valid] - off_p == w_dst[iid]).all()
        # labels: 1 on valid positives, 0 on negatives
        lab = np.asarray(batch.edge_label)
        assert (lab[:b][valid] == 1).all() and (lab[b:] == 0).all()
        # hetero feature join is a per-type dict
        assert set(batch.x.keys()) == {"author", "paper"}
    assert n_batches == -(-len(w_src) // b)


def test_hetero_link_pred_end_to_end(hetero_lp_store):
    import optax
    fs, gs, n_p, n_a, (w_src, w_dst) = hetero_lp_store
    g = gs.finalize()
    etype_names = ["__".join(et) for et in g.etypes]
    b = 16
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[3, 3],
        edge_label_index=(ET, np.stack([w_src, w_dst])),
        neg_sampling="binary", batch_size=b, shuffle=True, seed=3)
    model = RGCN(num_relations=len(etype_names), hidden_features=16,
                 out_features=16, num_layers=2)

    def to_rel_batches(sample):
        return [[(hop[en].neigh_local, hop[en].mask) if en in hop else None
                 for en in etype_names]
                for hop in reversed(sample.hops)]

    def input_features(x_dict):
        total = None
        for x in x_dict.values():
            total = x if total is None else total + x
        return total

    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), input_features(b0.x),
                        to_rel_batches(b0.sample))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, rel_batches, eli, lab, seeds):
        def loss_fn(p):
            h = model.apply(p, x, rel_batches)
            # seed embeddings sit at the fixed seed layout positions
            score = jnp.sum(h[eli[0]] * h[eli[1]], axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, lab)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for epoch in range(8):
        for batch in loader:
            params, opt, loss = step(
                params, opt, input_features(batch.x),
                to_rel_batches(batch.sample), batch.edge_label_index,
                batch.edge_label, batch.seeds)
            losses.append(float(loss))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
