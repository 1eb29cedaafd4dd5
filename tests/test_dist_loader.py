"""DistNeighborLoader: the loader product over the 8-device CPU mesh
(ref cugraph-pyg examples/gcn_dist_mnmg.py deployment shape: loader =
sharded stores + distributed sampler + feature gather)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import DistNeighborLoader
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


@pytest.fixture(scope="module")
def stores():
    rng = np.random.default_rng(11)
    n, e, f = 200, 3000, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = (np.arange(n) % 7).astype(np.int32)
    fs[("", "x")] = x
    fs[("", "y")] = y
    fs[("", "w")] = rng.uniform(0.1, 1.0, e).astype(np.float32)
    return fs, gs, x, y, src, dst


def test_dist_loader_batches_and_features(mesh, stores):
    fs, gs, x, y, src, dst = stores
    loader = DistNeighborLoader((fs, gs), [4, 4], mesh=mesh,
                                batch_size=64, seed=3)
    n = gs.num_nodes()
    seen = 0
    for batch in loader:
        seeds = np.asarray(batch.seeds)
        valid = seeds >= 0
        seen += int(valid.sum())
        # labels match ground truth for valid seeds
        yb = np.asarray(batch.y)
        np.testing.assert_array_equal(yb[valid], y[seeds[valid]])
        assert (yb[~valid] == -1).all()
        # gathered features match ground truth rows
        inp = np.asarray(batch.sample.input_nodes)
        xb = np.asarray(batch.x)
        ok = inp >= 0
        np.testing.assert_allclose(xb[ok], x[inp[ok]], rtol=1e-6)
        assert (xb[~ok] == 0).all()
        # every hop-0 neighbor is a true in-neighbor of its seed
        ng = np.asarray(batch.sample.hops[0].neigh_global)
        world = 8
        lb = loader.local_batch
        for r in range(world):
            for i in range(lb):
                s = seeds[r * lb + i]
                if s < 0:
                    continue
                nbrs = ng.reshape(world, lb, -1)[r, i]
                true_in = set(src[dst == s].tolist())
                for nb in nbrs[nbrs >= 0]:
                    assert nb in true_in
        break  # one batch is enough for the detailed checks
    assert seen > 0
    assert len(loader) == -(-n // 64)


def test_dist_loader_epoch_covers_inputs(mesh, stores):
    fs, gs, x, y, _, _ = stores
    inp = np.arange(0, 100, 2)
    loader = DistNeighborLoader((fs, gs), [3], mesh=mesh,
                                input_nodes=inp, batch_size=32,
                                shuffle=True)
    got = []
    for batch in loader:
        s = np.asarray(batch.seeds)
        got.extend(s[s >= 0].tolist())
    assert sorted(got) == sorted(inp.tolist())


def test_dist_loader_weighted_and_dedup(mesh, stores):
    fs, gs, x, y, src, dst = stores
    loader = DistNeighborLoader((fs, gs), [4, 4], mesh=mesh,
                                batch_size=32, weight_attr="w",
                                dedup=True)
    assert loader.dist_graph.weights is not None
    batch = next(iter(loader))
    # dedup: per-shard levels unique
    lvl = np.asarray(batch.sample.levels[1]).reshape(8, -1)
    for r in range(8):
        v = lvl[r][lvl[r] >= 0]
        assert len(np.unique(v)) == len(v)
    # features still correct under dedup
    inp = np.asarray(batch.sample.input_nodes)
    xb = np.asarray(batch.x)
    ok = inp >= 0
    np.testing.assert_allclose(xb[ok], x[inp[ok]], rtol=1e-6)


def test_dist_loader_trains(mesh, stores):
    """~20-line user loop: loader + model + optimizer over the mesh."""
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE

    fs, gs, x, y, _, _ = stores
    loader = DistNeighborLoader((fs, gs), [4, 4], mesh=mesh,
                                batch_size=64, shuffle=True)
    model = GraphSAGE(hidden_features=16, out_features=7, num_layers=2)
    batch0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch0.x, batch0.sample)
    tx = optax.adam(5e-2)
    opt = tx.init(params)

    @jax.jit
    def update(params, opt, batch):
        def loss_fn(p):
            logits = model.apply(p, batch.x, batch.sample)
            valid = batch.seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(batch.y, 0))
            return (jnp.sum(jnp.where(valid, ls, 0))
                    / jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(3):
        for batch in loader:
            params, opt, loss = update(params, opt, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
