"""Regression tests for the round-2 self-review findings: triplet
true-edge rejection, temporal link loading, capacity validation, and
the hetero max_unique_per_hop guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader.link_loader import LinkNeighborLoader
from cugraph_gnn_tpu.sampler import NeighborSampler
from cugraph_gnn_tpu.sampler.negative import (
    NegativeSampling,
    make_edge_key_sorted,
)


def test_triplet_reject_true_edges_tests_actual_pairs():
    """Triplet negatives must be rejected against the ACTUAL (positive
    source, corrupted dst) pairs — not an unrelated random source."""
    from cugraph_gnn_tpu.loader.link_loader import draw_negatives
    n_src, n_dst = 16, 20
    # dense true-edge set: every src connects to dst < 15 (75% of the
    # dst space) -> without rejection most corruptions are true edges
    src = np.repeat(np.arange(n_src), 15)
    dst = np.tile(np.arange(15), n_src)
    eks = make_edge_key_sorted(src, dst, n_dst)
    neg = NegativeSampling(mode="triplet", amount=4)
    ps = jnp.arange(8, dtype=jnp.int32)
    true = set(zip(src.tolist(), dst.tolist()))
    for trial in range(5):
        ns, nd = draw_negatives(jax.random.PRNGKey(trial), ps, 32,
                                n_src, n_dst, neg, eks)
        ns, nd = np.asarray(ns), np.asarray(nd)
        np.testing.assert_array_equal(ns, np.repeat(np.arange(8), 4))
        for s, d in zip(ns, nd):
            if d >= 0:
                assert (int(s), int(d)) not in true, (s, d)


def test_temporal_link_loader_respects_edge_label_time(rng):
    n, e = 40, 500
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    etime = rng.integers(0, 100, e).astype(np.int32)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = rng.standard_normal((n, 4)).astype(np.float32)
    fs[("", "t")] = etime

    eli = np.stack([src[:64], dst[:64]])
    elt = etime[:64]
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=[4], edge_label_index=eli,
        neg_sampling="binary", batch_size=16, time_attr="t",
        edge_label_time=elt)
    g = gs.finalize()
    et = g.etypes[0]
    etime_csr = np.asarray(g.edge_attr_to_csr_order(et, etime))

    b = 16
    saw = False
    for i, batch in enumerate(loader):
        eids = np.asarray(batch.sample.hops[0].edge_ids)
        seeds = np.asarray(batch.seeds)
        # seed slot j's time: positives [t|t], negatives cycle t
        t = elt[i * b:(i + 1) * b]
        t = np.pad(t, (0, b - len(t)))
        times = np.concatenate([t, t, t, t])
        ok = eids >= 0
        saw |= bool(ok.any())
        for j in range(eids.shape[0]):
            sel = eids[j][eids[j] >= 0]
            if seeds[j] >= 0 and len(sel):
                assert (etime_csr[sel] <= times[j]).all(), j
        if i >= 1:
            break
    assert saw


def test_temporal_link_loader_requires_edge_label_time(rng):
    n = 20
    gs = GraphStore()
    gs.put_edge_index((np.arange(n - 1), np.arange(1, n)),
                      ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = np.zeros((n, 4), np.float32)
    fs[("", "t")] = np.zeros(n - 1, np.int32)
    with pytest.raises(ValueError, match="edge_label_time"):
        LinkNeighborLoader((fs, gs), num_neighbors=[2],
                           edge_label_index=np.zeros((2, 4), np.int64),
                           time_attr="t")


def test_max_unique_per_hop_below_level_size_raises(rng):
    n = 64
    src = rng.integers(0, n, 400).astype(np.int64)
    dst = rng.integers(0, n, 400).astype(np.int64)
    from cugraph_gnn_tpu.ops import coo_to_csr_np
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    sampler = NeighborSampler(jnp.asarray(indptr), jnp.asarray(indices),
                              [4, 4], dedup=True,
                              max_unique_per_hop=[8, 100])
    # batch 32 > cap 8 at level 1: must fail loudly, not corrupt indices
    with pytest.raises(ValueError, match="smaller than level"):
        sampler.sample(jax.random.PRNGKey(0),
                       jnp.arange(32, dtype=jnp.int32))


def test_hetero_max_unique_per_hop_caps_levels(rng):
    """Hetero level-capacity budget: levels are bounded by the caps,
    sampling stays correct, and too-small caps raise."""
    n_a = n_b = 40
    e = 400
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_a, e), rng.integers(0, n_b, e)),
                      ("a", "r1", "b"), num_nodes=(n_a, n_b))
    gs.put_edge_index((rng.integers(0, n_b, e), rng.integers(0, n_a, e)),
                      ("b", "r2", "a"), num_nodes=(n_b, n_a))
    fs = FeatureStore()
    from cugraph_gnn_tpu.loader.node_loader import build_neighbor_sampler
    batch = 16
    caps = [48, 64]
    sampler = build_neighbor_sampler(fs, gs, [3, 3],
                                     max_unique_per_hop=caps)
    seeds = jnp.arange(batch, dtype=jnp.int32)  # global ids (type 'a')
    out = sampler.sample(jax.random.PRNGKey(0), seeds)
    assert out.levels[1].shape[0] == caps[0]
    assert out.levels[2].shape[0] == caps[1]
    # level uniqueness (the dedup layout) holds under the caps
    for lvl in out.levels[1:]:
        v = np.asarray(lvl)
        v = v[v >= 0]
        assert len(np.unique(v)) == len(v)
    # every hop-0 neighbor_local points into level 1
    for blk in out.hops[0].values():
        nl = np.asarray(blk.neigh_local)
        assert nl.max() < caps[0]
    # cap below the seed count is rejected loudly
    tight = build_neighbor_sampler(fs, gs, [3, 3],
                                   max_unique_per_hop=[8, 64])
    with pytest.raises(ValueError, match="smaller than level"):
        tight.sample(jax.random.PRNGKey(0), seeds)


def test_dist_temporal_link_loader_respects_times(rng):
    """DistLinkNeighborLoader + time_attr + edge_label_time over the
    8-device mesh: per-seed times must shard with the seeds (the
    node_times in_spec was keyed to input_time and broke / silently
    used shard 0's slice)."""
    from jax.sharding import Mesh

    from cugraph_gnn_tpu.loader import DistLinkNeighborLoader
    from cugraph_gnn_tpu.parallel import STORE_AXIS

    n, e = 48, 600
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    etime = rng.integers(0, 100, e).astype(np.int32)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = rng.standard_normal((n, 4)).astype(np.float32)
    fs[("", "t")] = etime

    mesh = Mesh(np.array(jax.devices()[:8]), (STORE_AXIS,))
    eli = np.stack([src[:64], dst[:64]])
    elt = etime[:64]
    loader = DistLinkNeighborLoader(
        (fs, gs), [3], mesh=mesh, edge_label_index=eli,
        neg_sampling="binary", batch_size=16, time_attr="t",
        edge_label_time=elt)
    g = gs.finalize()
    etime_csr = np.asarray(
        g.edge_attr_to_csr_order(("N", "e", "N"), etime))

    b = 16
    saw = False
    for i, batch in enumerate(loader):
        eids = np.asarray(batch.sample.hops[0].edge_ids)
        seeds = np.asarray(batch.seeds)
        bt = elt[i * b:(i + 1) * b]
        t = np.full((b,), bt.max() if len(bt) else 0, elt.dtype)
        t[: len(bt)] = bt
        times = np.zeros(seeds.shape[0], elt.dtype)
        n_neg = loader.num_neg
        times[:b] = t
        times[b:2 * b] = t
        times[2 * b:2 * b + n_neg] = np.tile(t, -(-n_neg // b))[:n_neg]
        times[2 * b + n_neg:2 * b + 2 * n_neg] = times[
            2 * b:2 * b + n_neg]
        ok = eids >= 0
        saw |= bool(ok.any())
        for j in range(eids.shape[0]):
            sel = eids[j][eids[j] >= 0]
            if seeds[j] >= 0 and len(sel) and j < 2 * b + 2 * n_neg:
                assert (etime_csr[sel] <= times[j]).all(), j
        if i >= 1:
            break
    assert saw


def test_link_loader_rejects_orphan_edge_label_time(rng):
    n = 20
    gs = GraphStore()
    gs.put_edge_index((np.arange(n - 1), np.arange(1, n)),
                      ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = np.zeros((n, 4), np.float32)
    with pytest.raises(ValueError, match="requires time_attr"):
        LinkNeighborLoader((fs, gs), num_neighbors=[2],
                           edge_label_index=np.zeros((2, 4), np.int64),
                           edge_label_time=np.zeros(4, np.int32))


def test_node_loader_rejects_time_attr_without_input_time(rng):
    n = 20
    gs = GraphStore()
    gs.put_edge_index((np.arange(n - 1), np.arange(1, n)),
                      ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = np.zeros((n, 4), np.float32)
    fs[("", "t")] = np.zeros(n - 1, np.int32)
    from cugraph_gnn_tpu.loader import NeighborLoader
    with pytest.raises(ValueError, match="input_time"):
        NeighborLoader((fs, gs), num_neighbors=[2], time_attr="t")


def test_disjoint_caps_apply():
    """DisjointNeighborSampler's max_unique_per_hop must actually cap
    the per-seed level capacities."""
    from cugraph_gnn_tpu.ops import coo_to_csr_np
    from cugraph_gnn_tpu.sampler import DisjointNeighborSampler
    rng2 = np.random.default_rng(0)
    n = 60
    src = rng2.integers(0, n, 600).astype(np.int64)
    dst = rng2.integers(0, n, 600).astype(np.int64)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    base = NeighborSampler(jnp.asarray(indptr), jnp.asarray(indices),
                           [4, 4], dedup=True)
    s = DisjointNeighborSampler(base, max_unique_per_hop=[3, 9])
    out = s.sample(jax.random.PRNGKey(0),
                   jnp.arange(6, dtype=jnp.int32))
    assert out.levels[1].shape == (6, 3)
    assert out.levels[2].shape == (6, 9)
