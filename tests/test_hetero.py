"""Heterogeneous sampling + RGCN end-to-end (BASELINE.json config 4 shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import NeighborLoader
from cugraph_gnn_tpu.models import RGCN
from cugraph_gnn_tpu.sampler.hetero import HeteroNeighborSampler


@pytest.fixture(scope="module")
def hetero_store():
    rng = np.random.default_rng(7)
    n_p, n_a = 40, 25  # papers, authors
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, 150), rng.integers(0, n_p, 150)),
                      ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    gs.put_edge_index((rng.integers(0, n_a, 120), rng.integers(0, n_p, 120)),
                      ("author", "writes", "paper"), num_nodes=(n_a, n_p))
    fs = FeatureStore()
    fs[("paper", "x")] = rng.standard_normal((n_p, 8)).astype(np.float32)
    fs[("author", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)
    fs[("paper", "y")] = (rng.integers(0, 3, n_p)).astype(np.int32)
    return fs, gs, n_p, n_a


def test_hetero_sampler_structure(hetero_store):
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    sampler = HeteroNeighborSampler(g, [4, 4])
    seeds = jnp.arange(8, dtype=jnp.int32) + g.node_offsets["paper"]
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    assert batch.num_hops == 2
    # paper rows receive both cites (from papers) and writes (from authors)
    blocks = batch.hops[0]
    assert set(blocks.keys()) == {"author__writes__paper",
                                  "paper__cites__paper"}
    # every sampled neighbor's global id in correct type range
    off_p, off_a = g.node_offsets["paper"], g.node_offsets["author"]
    ng = np.asarray(blocks["paper__cites__paper"].neigh_global)
    ok = ng >= 0
    assert ((ng[ok] >= off_p) & (ng[ok] < off_p + n_p)).all()
    ng_a = np.asarray(blocks["author__writes__paper"].neigh_global)
    ok_a = ng_a >= 0
    assert ((ng_a[ok_a] >= off_a) & (ng_a[ok_a] < off_a + n_a)).all()


def test_hetero_per_etype_fanout(hetero_store):
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    sampler = HeteroNeighborSampler(g, {
        ("paper", "cites", "paper"): [2, 2],
        ("author", "writes", "paper"): [3, 3],
    })
    seeds = jnp.arange(6, dtype=jnp.int32) + g.node_offsets["paper"]
    batch = sampler.sample(jax.random.PRNGKey(1), seeds)
    assert batch.hops[0]["paper__cites__paper"].neigh_local.shape == (6, 2)
    assert batch.hops[0]["author__writes__paper"].neigh_local.shape == (6, 3)


def test_hetero_edge_gid_disjoint(hetero_store):
    """Per-type edge ids must live in disjoint global ranges
    (edge_base offsets, like the reference's per-type edge-id packing)."""
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    sampler = HeteroNeighborSampler(g, [4])
    seeds = jnp.arange(10, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(2), seeds)
    ranges = {}
    base = 0
    for et in g.etypes:
        _, _, eb = g.csr_by_etype[et]
        ranges["__".join(et)] = eb
    e_w = np.asarray(batch.hops[0]["author__writes__paper"].edge_ids)
    e_c = np.asarray(batch.hops[0]["paper__cites__paper"].edge_ids)
    # author__writes__paper sorts first lexicographically -> base 0, 120 edges
    assert ((e_w[e_w >= 0] >= ranges["author__writes__paper"]) &
            (e_w[e_w >= 0] < ranges["author__writes__paper"] + 120)).all()
    assert ((e_c[e_c >= 0] >= ranges["paper__cites__paper"]) &
            (e_c[e_c >= 0] < ranges["paper__cites__paper"] + 150)).all()


def test_rgcn_trains_on_hetero_batches(hetero_store):
    import optax
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    loader = NeighborLoader((fs, gs), num_neighbors=[3, 3],
                            input_nodes=("paper", np.arange(n_p)),
                            batch_size=8, shuffle=True)
    etype_names = ["__".join(et) for et in g.etypes]
    model = RGCN(num_relations=len(etype_names), hidden_features=16,
                 out_features=3, num_layers=2)

    def to_rel_batches(sample, x_dict):
        """Convert a HeteroMultihopBatch + per-type features into the
        RGCN input: per layer [(neigh_local, mask)|None] per relation."""
        rel_batches = []
        for hop in reversed(sample.hops):
            blocks = []
            for en in etype_names:
                if en in hop:
                    blocks.append((hop[en].neigh_local, hop[en].mask))
                else:
                    blocks.append(None)
            rel_batches.append(blocks)
        return rel_batches

    def input_features(sample, x_dict):
        # combine typed features into one (S_L, F) matrix
        total = None
        for nt, x in x_dict.items():
            total = x if total is None else total + x
        return total

    b0 = next(iter(loader))
    x0 = input_features(b0.sample, b0.x)
    rb0 = to_rel_batches(b0.sample, b0.x)
    params = model.init(jax.random.PRNGKey(0), x0, rb0)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, rel_batches, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, rel_batches)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for epoch in range(6):
        for b in loader:
            y = b.y if b.y is not None else jnp.zeros((8,), jnp.int32)
            params, opt, loss = step(params, opt, input_features(b.sample, b.x),
                                     to_rel_batches(b.sample, b.x), y, b.seeds)
            losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

def test_hetero_weighted_and_temporal(hetero_store, rng):
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    # weights: cites edges weighted, writes uniform
    et_c = ("paper", "cites", "paper")
    n_c = len(gs.get_edge_index(et_c)[0])
    w = rng.random(n_c).astype(np.float32) + 0.1
    sampler = HeteroNeighborSampler(
        g, [4], weights_by_etype={et_c: w})
    seeds = jnp.arange(8, dtype=jnp.int32)
    b = sampler.sample(jax.random.PRNGKey(0), seeds)
    # without-replacement validity for the weighted etype
    e = np.asarray(b.hops[0]["paper__cites__paper"].edge_ids)
    for row in e:
        vals = row[row >= 0]
        assert len(set(vals.tolist())) == len(vals)

    # temporal: edges of 'cites' stamped with times; only t<=seed_time
    times = rng.integers(0, 100, n_c).astype(np.int32)
    sampler_t = HeteroNeighborSampler(
        g, [4], times_by_etype={et_c: times})
    st = jnp.full((8,), 50, jnp.int32)
    bt = sampler_t.sample(jax.random.PRNGKey(1), seeds, st)
    eids = np.asarray(bt.hops[0]["paper__cites__paper"].edge_ids)
    base = g.csr_by_etype[et_c][2]
    ok = eids >= 0
    assert (times[eids[ok] - base] <= 50).all()
