"""Hetero dedup=False static layout (round 5): zero-sort renumbering
with positional levels + free slice gather_neighbors — the hetero
analog of multihop_uniform(dedup=False) (tests/test_dedup_modes.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.models import RGCN
from cugraph_gnn_tpu.sampler.hetero import HeteroNeighborSampler


@pytest.fixture(scope="module")
def hetero_store():
    rng = np.random.default_rng(3)
    n_p, n_a = 40, 25
    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, 150), rng.integers(0, n_p, 150)),
                      ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    gs.put_edge_index((rng.integers(0, n_a, 120), rng.integers(0, n_p, 120)),
                      ("author", "writes", "paper"), num_nodes=(n_a, n_p))
    fs = FeatureStore()
    fs[("paper", "x")] = rng.standard_normal((n_p, 8)).astype(np.float32)
    fs[("author", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)
    return fs, gs, n_p, n_a


def test_static_layout_invariants(hetero_store):
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    s_fast = HeteroNeighborSampler(g, [4, 3], dedup=False)
    seeds = jnp.arange(8, dtype=jnp.int32) + g.node_offsets["paper"]
    b = s_fast.sample(jax.random.PRNGKey(0), seeds)
    assert b.static_layout and len(b.layouts) == 2
    for li, hop in enumerate(b.hops):
        lvl = np.asarray(b.levels[li + 1])
        # layout structure: [targets | per-etype blocks]
        t = np.asarray(b.levels[li]).shape[0]
        np.testing.assert_array_equal(lvl[:t], np.asarray(b.levels[li]))
        for en, blk in hop.items():
            nl = np.asarray(blk.neigh_local)
            ng = np.asarray(blk.neigh_global)
            ok = nl >= 0
            np.testing.assert_array_equal(lvl[nl[ok]], ng[ok])
            np.testing.assert_array_equal(ng[~ok], -1)
        # layout entries cover the level exactly
        end = t
        for en, start, fanout in b.layouts[li]:
            assert start == end
            end += hop[en].neigh_local.shape[0] * fanout
        assert end == lvl.shape[0]


def test_gather_neighbors_slice_equals_gather(hetero_store, rng):
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    s_fast = HeteroNeighborSampler(g, [4, 3], dedup=False)
    seeds = jnp.arange(8, dtype=jnp.int32) + g.node_offsets["paper"]
    b = s_fast.sample(jax.random.PRNGKey(1), seeds)
    h = jnp.asarray(
        rng.standard_normal((b.levels[-1].shape[0], 5)), jnp.float32)
    for en, blk in b.hops[-1].items():
        sliced = b.gather_neighbors(h, len(b.hops) - 1, en)
        safe = jnp.clip(blk.neigh_local, 0)
        gathered = h[safe]
        m = np.asarray(blk.mask)[..., None]
        np.testing.assert_allclose(np.asarray(sliced) * m,
                                   np.asarray(gathered) * m)


def test_dedup_modes_model_equal_with_full_fanout(hetero_store):
    """Fanouts >= per-type max degree aggregate every in-neighbor, so
    the RGCN output must be identical across renumbering layouts."""
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    kmax = max(g.max_degree_by_etype.values())
    etype_names = ["__".join(et) for et in g.etypes]
    seeds = jnp.arange(10, dtype=jnp.int32) + g.node_offsets["paper"]

    off = {nt: g.node_offsets[nt] for nt in ("paper", "author")}
    x_all = np.zeros((g.num_nodes_total, 8), np.float32)
    x_all[off["paper"]: off["paper"] + n_p] = np.asarray(
        fs.get_tensor("paper", "x"))
    x_all[off["author"]: off["author"] + n_a] = np.asarray(
        fs.get_tensor("author", "x"))
    x_all = jnp.asarray(x_all)

    model = RGCN(num_relations=len(etype_names), hidden_features=12,
                 out_features=3, num_layers=2)

    # build rel_batches through the public API for both modes and
    # compare model outputs
    outs = {}
    for dedup in (True, False):
        sampler = HeteroNeighborSampler(g, [kmax, kmax], dedup=dedup)
        b = sampler.sample(jax.random.PRNGKey(2), seeds)
        x = x_all[jnp.clip(b.input_nodes, 0)]
        x = jnp.where((b.input_nodes >= 0)[:, None], x, 0)
        rel = []
        for hop in reversed(b.hops):
            rel.append([
                (hop[en].neigh_local, hop[en].mask) if en in hop else None
                for en in etype_names])
        if dedup:
            params = model.init(jax.random.PRNGKey(3), x, rel)
        outs[dedup] = model.apply(params, x, rel)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=1e-4, atol=1e-5)


def test_batch_call_matches_rel_batches(hetero_store, rng):
    """RGCN.batch_call (slice-based consumption) == the rel_batches
    gather path, both layouts."""
    fs, gs, n_p, n_a = hetero_store
    g = gs.finalize()
    etype_names = ["__".join(et) for et in g.etypes]
    seeds = jnp.arange(6, dtype=jnp.int32) + g.node_offsets["paper"]
    x_all = jnp.asarray(
        rng.standard_normal((g.num_nodes_total, 8)), jnp.float32)
    model = RGCN(num_relations=len(etype_names), hidden_features=12,
                 out_features=3, num_layers=2)
    for dedup in (True, False):
        sampler = HeteroNeighborSampler(g, [3, 3], dedup=dedup)
        b = sampler.sample(jax.random.PRNGKey(4), seeds)
        x = jnp.where((b.input_nodes >= 0)[:, None],
                      x_all[jnp.clip(b.input_nodes, 0)], 0)
        rel = [[(hop[en].neigh_local, hop[en].mask) if en in hop else None
                for en in etype_names] for hop in reversed(b.hops)]
        params = model.init(jax.random.PRNGKey(5), x, rel)
        ref = model.apply(params, x, rel)
        out = model.apply(params, x, b, etype_names,
                          method=RGCN.batch_call)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_budget_requires_dedup(hetero_store):
    fs, gs, *_ = hetero_store
    g = gs.finalize()
    with pytest.raises(ValueError):
        HeteroNeighborSampler(g, [4, 4], dedup=False,
                              max_unique_per_hop=[100, 100])
