"""GraphStore / FeatureStore / NeighborLoader tests
(ref cugraph-pyg tests/loader/test_neighbor_loader.py basic cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import NeighborLoader


def make_stores(karate, with_features=True):
    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    fs = FeatureStore()
    if with_features:
        n = karate.num_nodes
        fs[("", "x")] = np.eye(n, dtype=np.float32)
        fs[("", "y")] = np.arange(n, dtype=np.int32) % 2
    return fs, gs


def test_graph_store_roundtrip(karate):
    _, gs = make_stores(karate, with_features=False)
    src, dst = gs.get_edge_index(("N", "e", "N"))
    np.testing.assert_array_equal(src, karate.src)
    np.testing.assert_array_equal(dst, karate.dst)
    assert gs.num_nodes() == karate.num_nodes
    assert gs.is_homogeneous


def test_sampling_graph_reversed_csr(karate):
    _, gs = make_stores(karate, with_features=False)
    g = gs.finalize()
    indptr, indices = g.homogeneous_csr()
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    # row v must contain exactly the sources of edges into v
    for v in [0, 5, 33]:
        expect = np.sort(karate.src[karate.dst == v])
        got = np.sort(indices[indptr[v]:indptr[v + 1]])
        np.testing.assert_array_equal(got, expect)


def test_feature_store_basic(rng):
    fs = FeatureStore()
    x = rng.standard_normal((20, 4)).astype(np.float32)
    fs[("", "x")] = x
    np.testing.assert_array_equal(np.asarray(fs[("", "x")]), x)
    ids = jnp.asarray([3, -1, 7])
    out = np.asarray(fs.get_tensor("", "x", ids))
    np.testing.assert_array_equal(out[0], x[3])
    np.testing.assert_array_equal(out[1], 0)
    np.testing.assert_array_equal(out[2], x[7])
    assert fs.get_tensor_size("", "x") == (20, 4)
    assert ("", "x") in fs


def test_neighbor_loader_iterates(karate):
    fs, gs = make_stores(karate)
    loader = NeighborLoader((fs, gs), num_neighbors=[5, 5], batch_size=8,
                            shuffle=True)
    n_batches = 0
    seen = []
    for batch in loader:
        n_batches += 1
        assert batch.x is not None and batch.y is not None
        s, = batch.seeds.shape
        assert s == 8
        assert batch.x.shape[0] == batch.sample.input_nodes.shape[0]
        valid = np.asarray(batch.seeds) >= 0
        seen.extend(np.asarray(batch.seeds)[valid].tolist())
        # features of input nodes must match one-hot ids
        x = np.asarray(batch.x)
        inp = np.asarray(batch.sample.input_nodes)
        for i in np.nonzero(inp >= 0)[0][:5]:
            assert x[i, inp[i]] == 1.0
    assert n_batches == len(loader) == (34 + 7) // 8
    assert sorted(seen) == list(range(34))  # every node exactly once


def test_neighbor_loader_drop_last(karate):
    fs, gs = make_stores(karate)
    loader = NeighborLoader((fs, gs), num_neighbors=[3], batch_size=8,
                            drop_last=True)
    batches = list(loader)
    assert len(batches) == 34 // 8
    for b in batches:
        assert int(b.num_valid) == 8


def test_neighbor_loader_biased(karate):
    fs, gs = make_stores(karate)
    # strongly prefer edges into node 33's neighborhood: weight by src id
    w = (karate.src + 1).astype(np.float32)
    fs[("", "w")] = w
    loader = NeighborLoader((fs, gs), num_neighbors=[5], batch_size=8,
                            weight_attr="w")
    batch = next(iter(loader))
    assert batch.sample.num_hops == 1


def test_hetero_loader(rng):
    gs = GraphStore()
    n_a, n_b = 20, 15
    e1 = (rng.integers(0, n_a, 60), rng.integers(0, n_b, 60))
    e2 = (rng.integers(0, n_b, 40), rng.integers(0, n_a, 40))
    gs.put_edge_index(e1, ("A", "ab", "B"), num_nodes=(n_a, n_b))
    gs.put_edge_index(e2, ("B", "ba", "A"), num_nodes=(n_b, n_a))
    fs = FeatureStore()
    fs[("A", "x")] = rng.standard_normal((n_a, 6)).astype(np.float32)
    fs[("B", "x")] = rng.standard_normal((n_b, 6)).astype(np.float32)
    loader = NeighborLoader((fs, gs), num_neighbors=[3, 3],
                            input_nodes=("A", np.arange(n_a)), batch_size=8)
    batch = next(iter(loader))
    assert batch.sample.num_hops == 2
    # seeds are type-A global ids: offset of "A" is 0 (lexicographic)
    assert (np.asarray(batch.seeds)[:8] < n_a).all()
    blocks = batch.sample.hops[0]
    assert set(blocks.keys()) == {"A__ab__B", "B__ba__A"}


def test_feature_store_host_location(rng):
    """location='host': rows in host RAM behind a device LFU cache
    (ref device_cached_host_embedding configuration)."""
    from cugraph_gnn_tpu.embedding.cache import CachePolicy
    fs = FeatureStore()
    x = rng.standard_normal((200, 16)).astype(np.float32)
    fs.put_tensor(x, "", "xh", location="host",
                  cache_policy=CachePolicy(cache_ratio=0.3, ways=4))
    np.testing.assert_array_equal(np.asarray(fs.get_tensor("", "xh")), x)
    ids = rng.integers(0, 200, 64).astype(np.int32)
    ids[::9] = -1
    for _ in range(3):  # repeated epochs exercise cache hits
        out = np.asarray(fs.get_tensor("", "xh", ids=jnp.asarray(ids)))
        expect = np.where((ids >= 0)[:, None], x[np.clip(ids, 0, None)], 0)
        np.testing.assert_allclose(out, expect, rtol=1e-6)
    assert fs.get_tensor_size("", "xh") == (200, 16)
    # uncached host location
    fs.put_tensor(x, "", "xn", location="host",
                  cache_policy=CachePolicy(kind="none"))
    out = np.asarray(fs.get_tensor("", "xn", ids=jnp.asarray(ids)))
    expect = np.where((ids >= 0)[:, None], x[np.clip(ids, 0, None)], 0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_feature_store_padding(rng):
    fs = FeatureStore(pad_features_to=128)
    x = rng.standard_normal((50, 100)).astype(np.float32)
    fs[("", "x")] = x
    # full read: logical width
    np.testing.assert_array_equal(np.asarray(fs[("", "x")]), x)
    # gather: padded width (the fast path)
    out = np.asarray(fs.get_tensor("", "x", ids=jnp.asarray([3, 7])))
    assert out.shape == (2, 128)
    np.testing.assert_array_equal(out[:, :100], x[[3, 7]])
    np.testing.assert_array_equal(out[:, 100:], 0)


def test_neighbor_loader_fast_path(karate):
    """dedup=False loader path: batches remain model-consumable."""
    from cugraph_gnn_tpu.models import GraphSAGE
    fs, gs = make_stores(karate)
    loader = NeighborLoader((fs, gs), num_neighbors=[4, 4], batch_size=8,
                            dedup=False)
    b = next(iter(loader))
    # static layout: levels grow as t*(k+1)
    assert b.sample.levels[1].shape[0] == 8 * 5
    assert b.sample.levels[2].shape[0] == 8 * 5 * 5
    model = GraphSAGE(hidden_features=8, out_features=2, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), b.x, b.sample)
    out = model.apply(params, b.x, b.sample)
    assert out.shape == (8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_auto_max_unique_per_hop_caps():
    """The 'auto' capacity heuristic (ref distributed_sampler.py:837-875
    local_seeds_per_call analog): caps respect the memory budget and the
    combinatorial worst case, and the loader accepts the knob."""
    from cugraph_gnn_tpu.sampler.heuristics import auto_max_unique_per_hop

    caps = auto_max_unique_per_hop(64, [10, 10], feat_dim=128,
                                   memory_bytes=16 * 2**30)
    assert caps[0] == 64 * 11          # worst case smaller than budget
    assert caps[1] <= caps[0] * 11
    # tiny budget clamps to the per-level row budget (never below seeds)
    tight = auto_max_unique_per_hop(64, [10, 10], feat_dim=128,
                                    memory_bytes=2**20)
    assert tight[0] >= 64 and tight[0] < 64 * 11
    assert tight[1] <= tight[0] * 11


def test_neighbor_loader_auto_caps(karate):
    fs, gs = make_stores(karate)
    loader = NeighborLoader((fs, gs), [4, 4], batch_size=8,
                            max_unique_per_hop="auto")
    batch = next(iter(loader))
    assert np.asarray(batch.y).shape == (8,)
    assert np.isfinite(np.asarray(batch.x)).all()
