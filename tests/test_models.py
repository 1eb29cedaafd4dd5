"""Model zoo tests: shape checks + sampled-vs-full consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.models import GAT, GCN, GIN, GraphSAGE, RGCN
from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.sampler import NeighborSampler


def build_sampler(karate, fanouts):
    # Message-passing direction: aggregate from in-neighbors, so the CSR
    # rows are destinations (sample over reversed edges, like PyG).
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, karate.num_nodes, sort_by="src")
    return NeighborSampler(indptr, indices, fanouts)


def test_graphsage_sampled_shapes(karate):
    sampler = build_sampler(karate, [5, 5])
    seeds = jnp.arange(8, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch.input_nodes.shape[0], 16))
    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(2), x, batch)
    out = model.apply(params, x, batch)
    assert out.shape == (8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_graphsage_full_batch(karate):
    n = karate.num_nodes
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 16))
    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)
    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(2), x, None,
                        method=lambda m, x, _: m.full(x, src, dst, n))
    out = model.apply(params, x, src, dst, n,
                      method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    assert out.shape == (n, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sampled_full_fanout_equals_full_batch(karate):
    """With fanout >= max degree, sampled GraphSAGE must equal full-batch
    (allclose per-layer parity, BASELINE.md correctness criterion)."""
    n = karate.num_nodes
    deg_max = int(np.bincount(karate.dst, minlength=n).max())
    sampler = build_sampler(karate, [deg_max, deg_max])
    seeds = jnp.arange(n, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (n, 8))

    model = GraphSAGE(hidden_features=16, out_features=4, num_layers=2)
    # features for sampled input nodes (pad rows -> 0)
    inp = batch.input_nodes
    x_in = jnp.where((inp >= 0)[:, None], x_full[jnp.clip(inp, 0)], 0)
    params = model.init(jax.random.PRNGKey(2), x_in, batch)
    out_sampled = model.apply(params, x_in, batch)

    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)
    out_full = model.apply(params, x_full, src, dst, n,
                           method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    np.testing.assert_allclose(
        np.asarray(out_sampled), np.asarray(out_full)[: n], rtol=2e-4,
        atol=2e-5)


def test_gat_shapes(karate):
    sampler = build_sampler(karate, [4, 4])
    seeds = jnp.arange(6, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch.input_nodes.shape[0], 12))
    model = GAT(hidden_features=16, out_features=3, num_layers=2, heads=4)
    params = model.init(jax.random.PRNGKey(2), x, batch)
    out = model.apply(params, x, batch)
    assert out.shape == (6, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gcn_full(karate):
    n = karate.num_nodes
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 8))
    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)
    model = GCN(hidden_features=16, out_features=2, num_layers=2)
    params = model.init(jax.random.PRNGKey(2), x, src, dst, n,
                        method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    out = model.apply(params, x, src, dst, n,
                      method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    assert out.shape == (n, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_rgcn_full(rng):
    n, e = 30, 120
    src = jnp.asarray(rng.integers(0, n, e))
    dst = jnp.asarray(rng.integers(0, n, e))
    etype = jnp.asarray(rng.integers(0, 3, e))
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 8))
    model = RGCN(num_relations=3, hidden_features=16, out_features=4)
    m = lambda mod, x, s, d, t, nn_: mod.full(x, s, d, t, nn_)
    params = model.init(jax.random.PRNGKey(2), x, src, dst, etype, n, method=m)
    out = model.apply(params, x, src, dst, etype, n, method=m)
    assert out.shape == (n, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_sampled_equals_full_with_full_fanout(karate):
    """GAT with fanout >= max degree must equal full-batch attention
    (allclose parity, BASELINE.md correctness criterion)."""
    n = karate.num_nodes
    deg_max = int(np.bincount(karate.dst, minlength=n).max())
    sampler = build_sampler(karate, [deg_max, deg_max])
    seeds = jnp.arange(n, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (n, 8))

    model = GAT(hidden_features=8, out_features=4, num_layers=2, heads=2)
    inp = batch.input_nodes
    x_in = jnp.where((inp >= 0)[:, None], x_full[jnp.clip(inp, 0)], 0)
    params = model.init(jax.random.PRNGKey(2), x_in, batch)
    out_sampled = model.apply(params, x_in, batch)

    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)
    out_full = model.apply(params, x_full, src, dst, n,
                           method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    np.testing.assert_allclose(
        np.asarray(out_sampled), np.asarray(out_full)[:n], rtol=2e-3,
        atol=2e-4)


@pytest.mark.parametrize("model_cls", [GraphSAGE, GCN, GAT, GIN])
def test_static_layout_slice_equals_gather(karate, model_cls):
    """dedup=False batches carry static_layout=True; the model's
    slice+reshape neighbor read must bit-match the explicit row gather
    (same batch with the flag cleared)."""
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, karate.num_nodes, sort_by="src")
    sampler = NeighborSampler(indptr, indices, [4, 4], dedup=False)
    seeds = jnp.asarray([0, 1, 2, 3, -1, 5, 33, 7], jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    assert batch.static_layout
    # Padded input slots get zero features, as the loaders produce.
    inp = batch.input_nodes
    x = jax.random.normal(jax.random.PRNGKey(1), (inp.shape[0], 16))
    x = jnp.where((inp >= 0)[:, None], x, 0)
    model = model_cls(hidden_features=32, out_features=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(2), x, batch)
    out_slice = model.apply(params, x, batch)
    out_gather = model.apply(params, x, batch._replace(static_layout=False))
    np.testing.assert_array_equal(np.asarray(out_slice),
                                  np.asarray(out_gather))
    assert np.isfinite(np.asarray(out_slice)).all()


def test_gin_sampled_equals_full_with_full_fanout(karate):
    """GIN (sum aggregation): sampled with fanout >= max degree must
    equal full-batch (ref dist_gin_sg.py model family)."""
    n = karate.num_nodes
    deg_max = int(np.bincount(karate.dst, minlength=n).max())
    sampler = build_sampler(karate, [deg_max, deg_max])
    seeds = jnp.arange(n, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (n, 8))
    model = GIN(hidden_features=16, out_features=4, num_layers=2)
    inp = batch.input_nodes
    x_in = jnp.where((inp >= 0)[:, None], x_full[jnp.clip(inp, 0)], 0)
    params = model.init(jax.random.PRNGKey(2), x_in, batch)
    out_sampled = model.apply(params, x_in, batch)
    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)
    out_full = model.apply(params, x_full, src, dst, n,
                           method=lambda m, x, s, d, nn_: m.full(x, s, d, nn_))
    np.testing.assert_allclose(
        np.asarray(out_sampled), np.asarray(out_full)[:n], rtol=2e-4,
        atol=2e-5)
