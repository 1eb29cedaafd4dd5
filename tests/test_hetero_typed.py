"""Typed target segments in the batched hetero sampler (round 5).

hetero_multihop_batched(dst_types=...) samples each edge type only
from the level positions whose node type matches the etype's dst type
(PyG hetero semantics).  The untyped layout samples every etype from
every target and relies on degree-0 rows to emit -1 slots — at
ogbn-mag shape ~57% of hop-2 slots were typed-mismatch garbage that
still paid sampling draws + feature-gather rows (PERF_NOTES round 5).

Parity strategy: with fanout >= max degree, without-replacement
sampling returns the FULL neighborhood, so mean aggregation is
order-invariant and the typed and untyped RGCN forwards must agree to
float tolerance despite different draw streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.models import RGCN
from cugraph_gnn_tpu.sampler.hetero import hetero_multihop_batched

P, A, F_ = 40, 30, 20          # papers, authors, fields
N = P + A + F_
MAXDEG = 4
ETYPES = ["paper__cites__paper", "author__writes__paper",
          "field__topic__paper"]
SRC_RANGE = {"paper__cites__paper": (0, P),
             "author__writes__paper": (P, P + A),
             "field__topic__paper": (P + A, N)}
DST_TYPES = {e: "paper" for e in ETYPES}
SRC_TYPES = {"paper__cites__paper": "paper",
             "author__writes__paper": "author",
             "field__topic__paper": "field"}


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    csrs, maxdeg, bases = {}, {}, {}
    base = 0
    for en in ETYPES:
        lo, hi = SRC_RANGE[en]
        deg = np.zeros(N, np.int64)
        deg[:P] = rng.integers(1, MAXDEG + 1, P)   # only papers expand
        ip = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
        e = int(ip[-1])
        pad = (-e) % 128
        ix = np.concatenate([rng.integers(lo, hi, e),
                             np.full(pad, -1)]).astype(np.int32)
        # window-gather path wants the padded 2D view to divide evenly
        csrs[en] = (jnp.asarray(ip), jnp.asarray(ix))
        maxdeg[en] = int(deg.max())
        bases[en] = base
        base += e
    return csrs, maxdeg, bases


KW = dict(etype_names=ETYPES,
          fanouts={e: [MAXDEG, MAXDEG] for e in ETYPES},
          caps=[8, 8 * 13, 8 * 13 * 13])


def _samples(key, seeds, csrs, maxdeg, bases):
    untyped = hetero_multihop_batched(
        key, csrs, seeds, edge_bases=bases, max_degrees=maxdeg, **KW)
    typed = hetero_multihop_batched(
        key, csrs, seeds, edge_bases=bases, max_degrees=maxdeg,
        seed_type="paper", dst_types=DST_TYPES, src_types=SRC_TYPES,
        **KW)
    return untyped, typed


def test_typed_layout_shrinks_levels_and_keeps_structure():
    csrs, maxdeg, bases = _graph()
    seeds = jnp.asarray(
        np.random.default_rng(1).integers(0, P, (3, 8)), jnp.int32)
    untyped, typed = _samples(jax.random.PRNGKey(0), seeds, csrs,
                              maxdeg, bases)
    # hop-1 identical widths (all seeds are papers), hop-2 shrinks:
    # only the paper positions (8 seeds + 32 cites) expand
    assert untyped.levels[1].shape == typed.levels[1].shape
    assert typed.levels[2].shape[1] < untyped.levels[2].shape[1]
    t2 = 8 + 8 * MAXDEG                       # typed hop-2 targets
    assert typed.levels[2].shape[1] == (
        typed.levels[1].shape[1] + 3 * t2 * MAXDEG)
    # typed entries carry the segment plan; every covered segment is
    # a paper segment
    for entry in typed.layouts[1]:
        assert len(entry) == 4
        plan = entry[3]
        assert sum(l for l, cov in plan if cov) == t2
    # neighbors land in the etype's src id range (or -1)
    for en in ETYPES:
        lo, hi = SRC_RANGE[en]
        ng = np.asarray(typed.hops[1][en].neigh_global)
        ok = (ng == -1) | ((ng >= lo) & (ng < hi))
        assert ok.all()


@pytest.mark.parametrize("steps", [1, 3])
def test_typed_rgcn_forward_matches_untyped(steps):
    csrs, maxdeg, bases = _graph()
    rng = np.random.default_rng(2)
    seeds = jnp.asarray(rng.integers(0, P, (steps, 8)), jnp.int32)
    untyped, typed = _samples(jax.random.PRNGKey(3), seeds, csrs,
                              maxdeg, bases)
    feats = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    model = RGCN(num_relations=3, hidden_features=16, out_features=5,
                 num_layers=2)

    def forward(batch):
        def one(s):
            x = feats[jnp.clip(s.input_nodes, 0)]
            return x, s
        s0 = jax.tree_util.tree_map(lambda a: a[0], batch)
        x0, _ = one(s0)
        params = model.init(jax.random.PRNGKey(4), x0, s0, ETYPES,
                            method=RGCN.batch_call)
        outs = []
        for i in range(steps):
            s = jax.tree_util.tree_map(lambda a: a[i], batch)
            x, s = one(s)
            outs.append(model.apply(params, x, s, ETYPES,
                                    method=RGCN.batch_call))
        return jnp.stack(outs)

    # fanout >= max degree -> both layouts aggregate the FULL
    # neighborhood; mean is order-invariant, so outputs must agree
    out_u = forward(untyped)
    out_t = forward(typed)
    assert np.allclose(np.asarray(out_u), np.asarray(out_t),
                       rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(out_t)).max() > 0


def test_sampler_class_typed_path():
    """HeteroNeighborSampler(seed_type=...) derives src/dst types from
    the (src, rel, dst) etype tuples and produces typed layouts through
    the GraphStore -> SamplingGraph product path."""
    from cugraph_gnn_tpu.data import GraphStore

    rng = np.random.default_rng(5)
    n_p, n_a = 20, 12
    gs = GraphStore()
    gs.put_edge_index(
        (rng.integers(0, n_p, 60), rng.integers(0, n_p, 60)),
        ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    gs.put_edge_index(
        (rng.integers(0, n_a, 50), rng.integers(0, n_p, 50)),
        ("author", "writes", "paper"), num_nodes=(n_a, n_p))
    g = gs.finalize()
    from cugraph_gnn_tpu.sampler.hetero import HeteroNeighborSampler
    sampler = HeteroNeighborSampler(g, [3, 2], dedup=False,
                                    seed_type="paper")
    seeds = jnp.arange(6, dtype=jnp.int32) + g.node_offsets["paper"]
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    assert batch.static_layout
    for hop in batch.layouts:
        for entry in hop:
            assert len(entry) == 4          # typed segment plans
    # hop-1: author positions (writes block) must NOT expand — only
    # paper segments are covered by every etype's plan
    t1 = batch.levels[1].shape[0]
    t1_papers = 6 + 6 * 3                  # seeds + cites block
    for entry in batch.layouts[1]:
        covered = sum(l for l, cov in entry[3] if cov)
        assert covered == t1_papers < t1
    # untyped comparison: same sampler minus seed_type covers all t1
    un = HeteroNeighborSampler(g, [3, 2], dedup=False)
    ub = un.sample(jax.random.PRNGKey(0), seeds)
    assert ub.levels[2].shape[0] > batch.levels[2].shape[0]
    # seed_type with dedup=True must be rejected
    with pytest.raises(ValueError):
        HeteroNeighborSampler(g, [3, 2], seed_type="paper")


def test_neighbor_loader_auto_typed():
    """NeighborLoader(dedup=False, input_nodes=(ntype, ids)) enables
    typed segments automatically on hetero stores."""
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader

    rng = np.random.default_rng(9)
    n_p, n_a = 24, 15
    gs = GraphStore()
    gs.put_edge_index(
        (rng.integers(0, n_p, 70), rng.integers(0, n_p, 70)),
        ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    gs.put_edge_index(
        (rng.integers(0, n_a, 60), rng.integers(0, n_p, 60)),
        ("author", "writes", "paper"), num_nodes=(n_a, n_p))
    fs = FeatureStore()
    fs[("paper", "x")] = rng.standard_normal((n_p, 8)).astype(np.float32)
    fs[("author", "x")] = rng.standard_normal((n_a, 8)).astype(np.float32)

    loader = NeighborLoader((fs, gs), num_neighbors=[3, 2],
                            input_nodes=("paper", np.arange(n_p)),
                            batch_size=8, dedup=False)
    batch = next(iter(loader))
    assert batch.sample.static_layout
    assert all(len(e) == 4 for hop in batch.sample.layouts for e in hop)
    # dedup=True (default) keeps the untyped path
    loader_d = NeighborLoader((fs, gs), num_neighbors=[3, 2],
                              input_nodes=("paper", np.arange(n_p)),
                              batch_size=8)
    b2 = next(iter(loader_d))
    assert not b2.sample.static_layout
