"""multihop_uniform_batched: S steps' sampling fused into one flattened
frontier per hop (round 5 — the gather-ramp restructure).

Checks that every per-step slice is a valid dedup=False static-layout
MultihopBatch, and replays the device draws on host for exact sample
equality (SURVEY §4's host-replay pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.ops.sample import floyd_positions_np
from cugraph_gnn_tpu.sampler.neighbor_sampler import (
    multihop_uniform,
    multihop_uniform_batched,
)

S, B = 3, 8
FANOUTS = (3, 2)


def _graph(karate):
    n = karate.num_nodes
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, n, sort_by="src")
    return n, np.asarray(indptr), np.asarray(indices)


def test_batched_slices_are_valid_static_batches(karate, rng):
    n, indptr, indices = _graph(karate)
    seeds = jnp.asarray(rng.integers(0, n, (S, B)), jnp.int32)
    out = multihop_uniform_batched(
        jax.random.PRNGKey(3), jnp.asarray(indptr), jnp.asarray(indices),
        seeds, FANOUTS)
    assert out.static_layout
    # leading step axis on every array leaf
    for lvl in out.levels:
        assert lvl.shape[0] == S
    assert out.seed_count.shape == (S,)
    for s in range(S):
        step = jax.tree_util.tree_map(lambda a: a[s], out)
        for li, hop in enumerate(step.hops):
            lvl = np.asarray(step.levels[li + 1])
            nl = np.asarray(hop.neigh_local)
            ng = np.asarray(hop.neigh_global)
            eid = np.asarray(hop.edge_ids)
            ok = nl >= 0
            # local positions resolve to the global ids
            np.testing.assert_array_equal(lvl[nl[ok]], ng[ok])
            np.testing.assert_array_equal(ng[~ok], -1)
            np.testing.assert_array_equal(eid[~ok], -1)
            # every sampled edge is a real CSR edge of its target
            tgt = np.asarray(step.levels[li])
            for i in range(nl.shape[0]):
                if tgt[i] < 0:
                    continue
                lo, hi = indptr[tgt[i]], indptr[tgt[i] + 1]
                for j in range(nl.shape[1]):
                    if ok[i, j]:
                        assert lo <= eid[i, j] < hi
                        assert indices[eid[i, j]] == ng[i, j]
            # static layout positions: t + i*fanout + j at valid slots
            t = tgt.shape[0]
            k = nl.shape[1]
            want = t + np.arange(t * k).reshape(t, k)
            np.testing.assert_array_equal(nl[ok], want[ok])


def test_batched_matches_host_replay(karate, rng):
    """Exact device/host equality: replay each hop's flattened uniform
    draws (same fold_in stream) through the NumPy Floyd reference."""
    n, indptr, indices = _graph(karate)
    seeds = jnp.asarray(rng.integers(0, n, (S, B)), jnp.int32)
    key = jax.random.PRNGKey(11)
    out = multihop_uniform_batched(
        key, jnp.asarray(indptr), jnp.asarray(indices), seeds, FANOUTS)
    targets = np.asarray(seeds)
    for h, fanout in enumerate(FANOUTS):
        flat = targets.reshape(-1)
        safe = np.where(flat >= 0, flat, 0)
        deg = np.where(flat >= 0, indptr[safe + 1] - indptr[safe], 0)
        u = np.asarray(jax.random.uniform(
            jax.random.fold_in(key, h), (flat.shape[0], fanout)))
        pos = floyd_positions_np(u, deg, fanout)
        start = indptr[safe]
        eids = np.where(pos >= 0, start[:, None] + pos, -1)
        neigh = np.where(pos >= 0, indices[np.clip(eids, 0, None)], -1)
        np.testing.assert_array_equal(
            np.asarray(out.hops[h].neigh_global),
            neigh.reshape(S, -1, fanout))
        np.testing.assert_array_equal(
            np.asarray(out.hops[h].edge_ids),
            eids.reshape(S, -1, fanout))
        targets = np.concatenate(
            [targets, neigh.reshape(S, -1)], axis=1)


def test_batched_hop0_matches_single_step_call(karate, rng):
    """Hop 0 of step slices equals per-step multihop_uniform when the
    flattened draw stream coincides (S=1)."""
    n, indptr, indices = _graph(karate)
    seeds = jnp.asarray(rng.integers(0, n, (1, B)), jnp.int32)
    key = jax.random.PRNGKey(5)
    a = multihop_uniform_batched(
        key, jnp.asarray(indptr), jnp.asarray(indices), seeds, FANOUTS)
    b = multihop_uniform(
        key, jnp.asarray(indptr), jnp.asarray(indices), seeds[0], FANOUTS,
        dedup=False)
    for ha, hb in zip(a.hops, b.hops):
        np.testing.assert_array_equal(np.asarray(ha.neigh_global[0]),
                                      np.asarray(hb.neigh_global))
        np.testing.assert_array_equal(np.asarray(ha.neigh_local[0]),
                                      np.asarray(hb.neigh_local))
    for la, lb in zip(a.levels, b.levels):
        np.testing.assert_array_equal(np.asarray(la[0]), np.asarray(lb))


def test_batched_scan_consumable(karate, rng):
    """lax.scan over the batched pytree slices per-step batches a model
    can consume (the bench's structure)."""
    n, indptr, indices = _graph(karate)
    seeds = jnp.asarray(rng.integers(0, n, (S, B)), jnp.int32)
    out = multihop_uniform_batched(
        jax.random.PRNGKey(7), jnp.asarray(indptr), jnp.asarray(indices),
        seeds, FANOUTS)
    feats = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

    def step(acc, sample):
        inp = sample.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        agg = sample.gather_neighbors(x, 1)  # (S_1, k, F)
        return acc + jnp.sum(agg * hopmask(sample, 1)), None

    def hopmask(sample, i):
        return sample.hops[i].mask[..., None].astype(jnp.float32)

    tot, _ = jax.lax.scan(step, jnp.zeros(()), out)
    # reference: same accumulation per sliced step
    want = 0.0
    for s in range(S):
        sample = jax.tree_util.tree_map(lambda a: a[s], out)
        inp = sample.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        agg = sample.gather_neighbors(x, 1)
        want += float(jnp.sum(agg * hopmask(sample, 1)))
    assert np.isclose(float(tot), want, rtol=1e-5)
