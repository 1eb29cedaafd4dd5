"""Multi-hop neighbor sampling pipeline (jit-compiled, static shapes).

Replaces the external pylibcugraph bulk samplers the reference calls
(ref cugraph_pyg/sampler/distributed_sampler.py:53-94,345-426) and the
WholeGraph-native multilayer loop
(ref pylibwholegraph/torch/graph_structure.py:136-196) with one fused,
jittable pipeline:

    per hop: one-hop sample (ops/sample.py) -> append_unique renumber
             (ops/unique.py) -> fixed-fanout HopBlock.

All shapes are static: level l has capacity S_{l+1} = S_l * (k_l + 1)
(each target plus its fanout), so the whole multi-hop sample compiles
once per (batch_size, fanouts) and never re-traces — the analog of the
reference's `local_seeds_per_call` fixed call groups.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.ops.unique import append_unique
from cugraph_gnn_tpu.sampler.output import HopBlock, MultihopBatch


def level_capacities(batch_size: int, fanouts: Sequence[int]) -> List[int]:
    """Static node-capacity bound per level: each target contributes
    itself plus up to ``fanout`` neighbors."""
    caps = [batch_size]
    for k in fanouts:
        caps.append(caps[-1] * (k + 1))
    return caps


def multihop_uniform(key, indptr, indices, seeds, fanouts,
                     dedup: bool = True, indices2d=None,
                     max_degree: int = None,
                     hub_frac=None) -> MultihopBatch:
    """Pure-functional uniform multi-hop sampling with *explicit* graph
    arguments.  Use this form inside larger jitted steps: closing over
    big device arrays embeds them as XLA constants (catastrophic compile
    times); explicit args stay parameters.

    dedup=False is the TPU fast path (the reference's
    ``deduplicate_sources=False``, ref neighbor_loader.py:208-210): the
    next level is the *static* layout [targets | neighbors row-major], so
    renumbering is position arithmetic — zero sorts.  On large graphs
    collisions are rare and dedup saves little compute while its sorts
    dominate the sampling step.

    hub_frac: float (all hops) or a per-hop tuple — hop 0's targets are
    the user's seeds (row-wise hub fraction), deeper hops' targets are
    degree-biased (edge-wise fraction; see
    window_gather.hub_fraction_edgewise).
    """
    fanouts = tuple(int(f) for f in fanouts)
    if hub_frac is None or np.isscalar(hub_frac):
        hub_frac = (hub_frac,) * len(fanouts)
    elif len(hub_frac) != len(fanouts):
        raise ValueError(
            f"hub_frac needs one entry per hop: got {len(hub_frac)} "
            f"for {len(fanouts)} fanouts")
    caps = level_capacities(int(seeds.shape[0]), fanouts)
    levels = [seeds.astype(jnp.int32)]
    level_counts = [jnp.sum(seeds >= 0).astype(jnp.int32)]
    hops: List[HopBlock] = []
    for h, fanout in enumerate(fanouts):
        hkey = jax.random.fold_in(key, h)
        targets = levels[-1]
        valid_seed = targets >= 0
        safe = jnp.where(valid_seed, targets, 0)
        out = sample_ops.uniform_sample(hkey, indptr, indices, safe, fanout,
                                        indices2d=indices2d,
                                        max_degree=max_degree,
                                        hub_frac=hub_frac[h])
        vm = valid_seed[:, None]
        out = sample_ops.SampleOutput(
            jnp.where(vm, out.neighbors, -1),
            jnp.where(vm, out.edge_ids, -1),
            jnp.where(valid_seed, out.num_sampled, 0))
        t = targets.shape[0]
        if dedup:
            uniq = append_unique(
                targets, out.neighbors.reshape(-1), max_unique=caps[h + 1])
            neigh_local = uniq.neighbor_map.reshape(out.neighbors.shape)
            next_level = uniq.unique_nodes
        else:
            # static layout: neighbor (i, j) sits at t + i*fanout + j
            pos = (t + jnp.arange(t * fanout, dtype=jnp.int32)
                   ).reshape(out.neighbors.shape)
            neigh_local = jnp.where(out.neighbors >= 0, pos, -1)
            next_level = jnp.concatenate(
                [targets, out.neighbors.reshape(-1)])
        hops.append(HopBlock(
            neigh_local=neigh_local,
            neigh_global=out.neighbors,
            edge_ids=out.edge_ids))
        levels.append(next_level)
        level_counts.append(jnp.sum(next_level >= 0).astype(jnp.int32))
    return MultihopBatch(levels=levels, level_counts=level_counts,
                         hops=hops, seed_count=level_counts[0],
                         static_layout=not dedup)


def multihop_uniform_batched(key, indptr, indices, seeds, fanouts,
                             indices2d=None, max_degree: int = None,
                             hub_frac=None) -> MultihopBatch:
    """S independent mini-batches sampled as ONE flattened frontier.

    seeds: (S, B) int32 — S steps' seed batches.  Per hop, the S
    frontiers are flattened to one (S*B_l,) batch so every per-seed op
    (Floyd draws, the neighbor-id window gather) runs at S times the
    batch size.  The XLA row gather underlying the window gather is
    row-RATE bound with a per-op ramp (benchmarks/gather_wall.py — at
    hop-2 scale a 10x larger batch lifts the whole sample stage 1.35x
    on v5e), so fusing steps is the lever the per-step layout leaves on
    the table.  The reference's analog is the bulk sampler's
    ``local_seeds_per_call`` call-grouping, which batches many seed
    groups into one device-side pass
    (ref cugraph_pyg/sampler/distributed_sampler.py:279-343).

    Returns a MultihopBatch whose every array leaf carries a leading
    step axis (S, ...); slicing step s (or `lax.scan`-ning over the
    pytree) yields exactly the single-step dedup=False static-layout
    batch `multihop_uniform(..., dedup=False)` would produce for
    seeds[s] — positions are per-step, not flattened.  Draw streams
    differ from S separate calls (one fold_in per hop across the
    flattened batch) but are iid uniform all the same.
    """
    fanouts = tuple(int(f) for f in fanouts)
    if hub_frac is None or np.isscalar(hub_frac):
        hub_frac = (hub_frac,) * len(fanouts)
    elif len(hub_frac) != len(fanouts):
        raise ValueError(
            f"hub_frac needs one entry per hop: got {len(hub_frac)} "
            f"for {len(fanouts)} fanouts")
    s_steps, batch = seeds.shape
    levels = [seeds.astype(jnp.int32)]
    level_counts = [jnp.sum(seeds >= 0, axis=1).astype(jnp.int32)]
    hops: List[HopBlock] = []
    for h, fanout in enumerate(fanouts):
        hkey = jax.random.fold_in(key, h)
        targets = levels[-1]                       # (S, B_l)
        t = targets.shape[1]
        flat = targets.reshape(-1)
        valid_seed = flat >= 0
        safe = jnp.where(valid_seed, flat, 0)
        out = sample_ops.uniform_sample(
            hkey, indptr, indices, safe, fanout, indices2d=indices2d,
            max_degree=max_degree, hub_frac=hub_frac[h])
        vm = valid_seed[:, None]
        neighbors = jnp.where(vm, out.neighbors, -1).reshape(
            s_steps, t, fanout)
        edge_ids = jnp.where(vm, out.edge_ids, -1).reshape(
            s_steps, t, fanout)
        # per-step static layout: neighbor (i, j) of step s sits at
        # t + i*fanout + j within step s's level l+1
        pos = (t + jnp.arange(t * fanout, dtype=jnp.int32)
               ).reshape(t, fanout)
        neigh_local = jnp.where(neighbors >= 0, pos[None], -1)
        next_level = jnp.concatenate(
            [targets, neighbors.reshape(s_steps, t * fanout)], axis=1)
        hops.append(HopBlock(
            neigh_local=neigh_local,
            neigh_global=neighbors,
            edge_ids=edge_ids))
        levels.append(next_level)
        level_counts.append(
            jnp.sum(next_level >= 0, axis=1).astype(jnp.int32))
    return MultihopBatch(levels=levels, level_counts=level_counts,
                         hops=hops, seed_count=level_counts[0],
                         static_layout=True)


class NeighborSampler:
    """Uniform / weighted / temporal multi-hop sampler over a CSR graph.

    Parameters
    ----------
    indptr, indices : device arrays (CSR; rows are *source* nodes whose
        out-edges point to sampled neighbors — for message passing the
        graph should be stored with edges reversed, as PyG does).
    fanouts : neighbors per hop, seed-side first (PyG `num_neighbors`).
    weights : optional per-edge weights -> biased sampling
        (ref neighbor_loader.py:173-181 weight_attr).
    edge_times / node_times : optional temporal attributes -> temporal
        sampling (ref neighbor_loader.py:182-190 time_attr).
    max_degree : static bound on any row degree (host-computed); only
        needed for weighted/temporal paths (chunked top-k loop bound).
    """

    def __init__(self, indptr, indices, fanouts: Sequence[int], *,
                 weights=None, edge_times=None, max_degree: Optional[int] = None,
                 chunk: int = 256, dedup: bool = True,
                 max_unique_per_hop: Optional[Sequence[int]] = None):
        """max_unique_per_hop: optional per-hop cap on the unique-node
        level capacity (dedup=True only) — the memory-budget lever the
        reference implements via seeds-per-call estimation
        (ref distributed_sampler.py:837-875 __calc_local_seeds_per_call).
        Overflow nodes beyond the budget are dropped (their fanout slots
        become -1 padding)."""
        from cugraph_gnn_tpu.ops.window_gather import (
            hub_fraction,
            hub_fraction_edgewise,
            pad_to_lines,
        )
        # Static hub fractions (host stats, free when indptr is host
        # data) right-size the hybrid gather's hub buffer — the
        # per-entry gather cost scales with the static capacity, not
        # the actual hub count.  Two regimes: hop-0 targets are the
        # user's seeds (row-wise fraction), deeper hops' targets are
        # drawn proportional to degree (edge-wise fraction — on
        # power-law graphs most edges point AT hubs, so the row-wise
        # estimate overflows every deep-hop batch into the slow exact
        # fallback).
        host_ip = isinstance(indptr, np.ndarray)
        self.hub_frac = hub_fraction(indptr) if host_ip else None
        self.hub_frac_deep = (hub_fraction_edgewise(indptr)
                              if host_ip else None)
        self.indptr = jnp.asarray(indptr)
        # Edge-value arrays are padded to a 512B-line multiple once at
        # construction so every per-edge read in the hot path can ride
        # the line-window gather (ops/window_gather.py — 9x over the
        # scalar gather on v5e).  CSR positions are unchanged.
        self.indices = pad_to_lines(jnp.asarray(indices))
        self.fanouts = tuple(int(f) for f in fanouts)
        self.weights = None if weights is None else pad_to_lines(
            jnp.asarray(weights))
        self.edge_times = None if edge_times is None else pad_to_lines(
            jnp.asarray(edge_times))
        self.max_degree = max_degree
        self.chunk = chunk
        self.dedup = dedup
        self.max_unique_per_hop = (None if max_unique_per_hop is None
                                   else [int(x) for x in max_unique_per_hop])
        if (weights is not None or edge_times is not None) and max_degree is None:
            raise ValueError("weighted/temporal sampling needs static max_degree")
        self._sample_jit = jax.jit(
            self._sample, static_argnames=("batch_size",))

    # -- one hop ------------------------------------------------------------

    def _one_hop(self, key, seeds, fanout, seed_time=None, *,
                 hub_frac=None):
        valid_seed = seeds >= 0
        safe = jnp.where(valid_seed, seeds, 0)
        # Line views are free reshapes inside the trace (arrays are
        # pre-padded in __init__); they route all per-edge reads through
        # the window gather.
        ind2d = self.indices.reshape(-1, 128)
        times = self.edge_times
        times2d = None if times is None else times.reshape(-1, 128)
        if self.weights is not None:
            et = st = None
            if times is not None and seed_time is not None:
                et, st = times, seed_time
            out = sample_ops.weighted_sample(
                key, self.indptr, self.indices, self.weights, safe, fanout,
                max_degree=self.max_degree, chunk=self.chunk,
                indices2d=ind2d, weights2d=self.weights.reshape(-1, 128),
                edge_times=et, times2d=times2d, seed_time=st)
        elif times is not None and seed_time is not None:
            out = sample_ops.masked_uniform_sample(
                key, self.indptr, self.indices, safe, fanout,
                max_degree=self.max_degree, chunk=self.chunk,
                indices2d=ind2d, edge_times=times, times2d=times2d,
                seed_time=seed_time)
        else:
            out = sample_ops.uniform_sample(
                key, self.indptr, self.indices, safe, fanout,
                indices2d=ind2d, max_degree=self.max_degree,
                hub_frac=self.hub_frac if hub_frac is None else hub_frac)
        # Mask out padded seeds entirely.
        vm = valid_seed[:, None]
        return sample_ops.SampleOutput(
            jnp.where(vm, out.neighbors, -1),
            jnp.where(vm, out.edge_ids, -1),
            jnp.where(valid_seed, out.num_sampled, 0),
        )

    # -- multi-hop ----------------------------------------------------------

    def _sample(self, key, seeds, node_times=None, *, batch_size: int):
        caps = level_capacities(batch_size, self.fanouts)
        if self.max_unique_per_hop is not None:
            assert self.dedup, "capacity budgets need dedup=True"
            from cugraph_gnn_tpu.sampler.heuristics import clamp_level_caps
            clamp_level_caps(caps, [f + 1 for f in self.fanouts],
                             self.max_unique_per_hop)
        levels = [seeds.astype(jnp.int32)]
        level_counts = [jnp.sum(seeds >= 0).astype(jnp.int32)]
        seed_time = node_times
        hops: List[HopBlock] = []
        for h, fanout in enumerate(self.fanouts):
            hkey = jax.random.fold_in(key, h)
            targets = levels[-1]
            out = self._one_hop(
                hkey, targets, fanout, seed_time,
                hub_frac=self.hub_frac if h == 0 else self.hub_frac_deep)
            t = targets.shape[0]
            if self.dedup:
                uniq = append_unique(
                    targets, out.neighbors.reshape(-1), max_unique=caps[h + 1])
                neigh_local = uniq.neighbor_map.reshape(out.neighbors.shape)
                next_level = uniq.unique_nodes
            else:
                pos = (t + jnp.arange(t * fanout, dtype=jnp.int32)
                       ).reshape(out.neighbors.shape)
                neigh_local = jnp.where(out.neighbors >= 0, pos, -1)
                next_level = jnp.concatenate(
                    [targets, out.neighbors.reshape(-1)])
            hops.append(HopBlock(
                neigh_local=neigh_local,
                neigh_global=out.neighbors,
                edge_ids=out.edge_ids,
            ))
            levels.append(next_level)
            level_counts.append(jnp.sum(next_level >= 0).astype(jnp.int32))
            if seed_time is not None:
                # Sampled nodes inherit their seed's time (PyG temporal
                # semantics, ref sampler_utils.py:213-311): propagate via
                # min over incoming assignment; padded -> +inf handled by
                # taking the target-prefix times and gathering for new.
                big = jnp.asarray(jnp.iinfo(jnp.int32).max, seed_time.dtype)
                times_full = jnp.full((caps[h + 1],), big, seed_time.dtype)
                times_full = times_full.at[: targets.shape[0]].set(seed_time)
                flat_loc = neigh_local.reshape(-1)
                flat_t = jnp.repeat(seed_time, fanout)
                ok = flat_loc >= 0
                times_full = times_full.at[jnp.where(ok, flat_loc, caps[h + 1] - 1)].min(
                    jnp.where(ok, flat_t, big))
                seed_time = times_full
        return MultihopBatch(
            levels=levels,
            level_counts=level_counts,
            hops=hops,
            seed_count=level_counts[0],
            static_layout=not self.dedup,
        )

    def sample(self, key, seeds, node_times=None) -> MultihopBatch:
        """Sample a multihop batch for ``seeds`` (fixed-size, -1 padded).

        Compiles once per seeds.shape; reuse the same batch size.
        """
        return self._sample_jit(
            key, seeds, node_times, batch_size=int(seeds.shape[0]))


# ---------------------------------------------------------------------------
# Host reference (NumPy) for tests — mirrors the device pipeline hop by hop
# using the same uniform draws (ref test strategy: SURVEY.md §4).
# ---------------------------------------------------------------------------


def uniform_sample_np(key, indptr, indices, seeds, fanout: int):
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    seeds = np.asarray(seeds)
    valid = seeds >= 0
    safe = np.where(valid, seeds, 0)
    deg = np.where(valid, indptr[safe + 1] - indptr[safe], 0)
    u = np.asarray(jax.random.uniform(key, (len(seeds), fanout)))
    pos = sample_ops.floyd_positions_np(u, deg, fanout)
    start = indptr[safe]
    edge_ids = np.where(pos >= 0, start[:, None] + pos, -1)
    neigh = np.where(pos >= 0, indices[np.clip(edge_ids, 0, None)], -1)
    return neigh.astype(np.int64), edge_ids.astype(np.int64)
