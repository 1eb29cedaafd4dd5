"""Heterogeneous multi-hop neighbor sampling (per-edge-type fanouts).

Replaces the reference's heterogeneous bulk sampler variants
(ref cugraph_pyg/sampler/distributed_sampler.py:53-94 heterogeneous_*
dispatch; hetero fanout dict flattening ref neighbor_loader.py:192-201).

Nodes live in one renumbered global id space (per-type offsets from
data/graph_store.py); each edge type has its own reversed CSR and its
own fanout schedule.  A hop samples every edge type for the current
frontier and append-uniques the union — yielding one node level shared
by all types plus per-type fixed-fanout HopBlocks (what RGCNConv
consumes).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.ops.unique import append_unique
from cugraph_gnn_tpu.sampler.output import HopBlock


class HeteroMultihopBatch(NamedTuple):
    levels: List[jax.Array]
    level_counts: List[jax.Array]
    hops: List[Dict[str, HopBlock]]   # per hop: edge-type-str -> block
    seed_count: jax.Array
    # Static shard count (see sampler/output.py MultihopBatch.num_shards):
    # > 1 when the batch came from a distributed sampler, where the
    # global arrays are per-shard arrays concatenated and neigh_local is
    # shard-relative.
    num_shards: int = 1
    # Static (pytree-aux) dedup=False layout metadata: per hop, a tuple
    # of (etype_name, start, fanout) describing the positional layout
    # levels[l+1] = [targets | et1 block row-major | et2 block | ...].
    # When set, gather_neighbors reads neighbor activations with a free
    # contiguous slice instead of a row gather — the hetero analog of
    # MultihopBatch.static_layout (on TPU the activation gathers are
    # row-rate bound, see PERF_NOTES.md).  () = dedup=True layout.
    layouts: tuple = ()

    @property
    def num_hops(self) -> int:
        return len(self.hops)

    @property
    def static_layout(self) -> bool:
        return bool(self.layouts)

    @property
    def input_nodes(self):
        return self.levels[-1]

    def dst_activations(self, h, hop_index: int):
        """Level-l target rows of the level-(l+1) activation array
        (blockwise prefix when sharded)."""
        from cugraph_gnn_tpu.sampler.output import shard_prefix
        if self.layouts:
            # static layouts: the level width IS the target count (a
            # typed hop block covers only its dst-type segment, so its
            # shape understates the level — see hetero_multihop_batched)
            s_l = self.levels[hop_index].shape[-1]
        else:
            blocks = self.hops[hop_index]
            s_l = next(iter(blocks.values())).neigh_local.shape[0]
        return shard_prefix(h, s_l, self.num_shards)

    def gather_neighbors(self, h, hop_index: int, etype: str):
        """Neighbor activations for one edge type's block of hop l
        (shard-relative indices handled; mask with the block's mask)."""
        from cugraph_gnn_tpu.sampler.output import shard_gather
        blk = self.hops[hop_index][etype]
        if self.layouts and self.num_shards == 1:
            # entries are (ename, start, fanout) or, for typed target
            # segments, (ename, start, fanout, segment_plan)
            for entry in self.layouts[hop_index]:
                if entry[0] == etype:
                    start, fanout = entry[1], entry[2]
                    t = blk.neigh_local.shape[0]
                    if h.shape[0] >= start + t * fanout:
                        return h[start: start + t * fanout].reshape(
                            t, fanout, *h.shape[1:])
        return shard_gather(h, blk.neigh_local, self.num_shards)


jax.tree_util.register_pytree_node(
    HeteroMultihopBatch,
    lambda b: ((b.levels, b.level_counts, b.hops, b.seed_count),
               (b.num_shards, b.layouts)),
    lambda aux, c: HeteroMultihopBatch(*c, num_shards=aux[0],
                                       layouts=aux[1]),
)


def _etype_str(et) -> str:
    return "__".join(et) if isinstance(et, tuple) else str(et)


class HeteroNeighborSampler:
    """graph: data.graph_store.SamplingGraph.  fanouts: list (shared by
    all edge types) or dict {edge_type: list} (PyG fanout-dict semantics,
    ref neighbor_loader.py:192-201).

    weights_by_etype / times_by_etype: optional {etype: per-edge array in
    CSR edge order} enabling biased / temporal sampling per edge type
    (ref distributed_sampler.py:53-94 heterogeneous biased/temporal
    variants).
    """

    def __init__(self, graph, fanouts: Union[Sequence[int], Dict],
                 weights_by_etype: Optional[Dict] = None,
                 times_by_etype: Optional[Dict] = None,
                 max_unique_per_hop: Optional[Sequence[int]] = None,
                 dedup: bool = True, seed_type: Optional[str] = None):
        from cugraph_gnn_tpu.ops.window_gather import pad_to_lines
        self.graph = graph
        self.etypes = list(graph.etypes)
        # typed target segments (dedup=False fast path): with the seed
        # node type known, each etype expands only the positions of its
        # dst type — src/dst types read off the (src, rel, dst) etype
        # tuples (graph CSR rows are destinations, cols sources)
        self.seed_type = seed_type
        if seed_type is not None:
            if dedup:
                raise ValueError("seed_type (typed segments) requires "
                                 "dedup=False")
            if not all(isinstance(et, tuple) and len(et) == 3
                       for et in self.etypes):
                raise ValueError("typed segments need (src, rel, dst) "
                                 "edge-type tuples")
            self.dst_types = {_etype_str(et): et[2] for et in self.etypes}
            self.src_types = {_etype_str(et): et[0] for et in self.etypes}
        else:
            self.dst_types = self.src_types = None
        # padded to 512B-line multiples for the window gather (matches
        # the padded per-etype CSR indices from SamplingGraph.build)
        self.weights = { _etype_str(k): pad_to_lines(jnp.asarray(v))
                         for k, v in (weights_by_etype or {}).items() }
        self.times = { _etype_str(k): pad_to_lines(jnp.asarray(v))
                       for k, v in (times_by_etype or {}).items() }
        if isinstance(fanouts, dict):
            norm = { _etype_str(k): [int(x) for x in v]
                     for k, v in fanouts.items() }
            self.fanouts = {
                _etype_str(et): norm.get(_etype_str(et))
                for et in self.etypes
            }
            lens = {len(v) for v in self.fanouts.values() if v is not None}
            assert len(lens) == 1, "all edge types need equal hop count"
            self.num_hops = lens.pop()
        else:
            f = [int(x) for x in fanouts]
            self.fanouts = {_etype_str(et): f for et in self.etypes}
            self.num_hops = len(f)
        self.max_unique_per_hop = max_unique_per_hop
        if not dedup and max_unique_per_hop is not None:
            raise ValueError("capacity budgets (max_unique_per_hop) need "
                             "dedup=True — dedup=False has fixed "
                             "positional capacities")
        self.dedup = dedup
        self._sample_jit = jax.jit(self._sample, static_argnames=("batch_size",))

    def _level_caps(self, batch_size: int) -> List[int]:
        growth = [
            1 + sum((self.fanouts[_etype_str(et)] or [0] * self.num_hops)[h]
                    for et in self.etypes)
            for h in range(self.num_hops)
        ]
        caps = [batch_size]
        for h in range(self.num_hops):
            caps.append(caps[-1] * growth[h])
        if self.max_unique_per_hop is not None:
            # memory budget (the reference's local_seeds_per_call analog
            # applied to level capacities, like the homogeneous sampler)
            from cugraph_gnn_tpu.sampler.heuristics import clamp_level_caps
            clamp_level_caps(caps, growth, self.max_unique_per_hop)
        return caps

    def _sample(self, key, seeds, node_times=None, *, batch_size: int):
        return hetero_multihop(
            key,
            {_etype_str(et): self.graph.csr_by_etype[et][:2]
             for et in self.etypes},
            seeds,
            etype_names=[_etype_str(et) for et in self.etypes],
            fanouts=self.fanouts,
            edge_bases={_etype_str(et): self.graph.csr_by_etype[et][2]
                        for et in self.etypes},
            max_degrees={_etype_str(et): self.graph.max_degree_by_etype[et]
                         for et in self.etypes},
            caps=self._level_caps(batch_size),
            weights=self.weights or None,
            times=self.times or None,
            node_times=node_times,
            dedup=self.dedup,
            seed_type=self.seed_type,
            dst_types=self.dst_types,
            src_types=self.src_types)

    def sample(self, key, seeds, node_times=None) -> HeteroMultihopBatch:
        return self._sample_jit(
            key, seeds, node_times, batch_size=int(seeds.shape[0]))


def hetero_multihop(key, csrs, seeds, *, etype_names, fanouts, edge_bases,
                    max_degrees, caps, weights=None, times=None,
                    node_times=None, dedup: bool = True, seed_type=None,
                    dst_types=None, src_types=None) -> HeteroMultihopBatch:
    """Functional heterogeneous multi-hop sample with *explicit* graph
    arguments (the hetero analog of ``multihop_uniform``): ``csrs`` maps
    edge-type name -> (indptr, indices) device arrays and can be passed
    straight through ``jit`` — closing over the per-type CSRs (as a
    bound method would) embeds them as XLA program constants, which
    costs a re-ship per dispatch on tunneled TPU hosts (PERF_NOTES.md).

    etype_names fixes the hop iteration order; fanouts maps name ->
    per-hop list (None / 0 skips the type that hop); edge_bases /
    max_degrees / caps are static ints.  weights / times: optional
    name-> per-edge array dicts (biased / temporal variants).

    dedup=False is the TPU fast path (hetero analog of
    ``multihop_uniform(dedup=False)``): level l+1 is the *static*
    layout [targets | et1 neighbors row-major | et2 | ...], so
    renumbering is position arithmetic and the per-hop append_unique —
    whose sort + binary-search machinery costs ~0.28 us per level slot
    on v5e (benchmarks/hetero_bisect_probe.py: 64 ms/step at mag scale
    vs ~5 ms without) — disappears.  Level capacities are IDENTICAL
    (the dedup budget already uses the no-dedup bound), and the batch
    carries ``layouts`` metadata so gather_neighbors turns into free
    contiguous slices.

    seed_type / dst_types / src_types enable TYPED target segments
    (each etype expands only dst-type positions — see
    hetero_multihop_batched): supported on the dedup=False non-temporal
    path, where this call delegates to the batched implementation at
    S=1 (identical draw streams: the flattened (1, B) seeds ARE the
    (B,) seeds and the fold_in structure matches).
    """
    if not dedup and not times and node_times is None:
        batched = hetero_multihop_batched(
            key, csrs, seeds[None], etype_names=etype_names,
            fanouts=fanouts, edge_bases=edge_bases,
            max_degrees=max_degrees, caps=caps, weights=weights,
            seed_type=seed_type, dst_types=dst_types,
            src_types=src_types)
        return jax.tree_util.tree_map(lambda a: a[0], batched)
    if dst_types is not None:
        raise ValueError("typed target segments need dedup=False and "
                         "non-temporal sampling (the static layout)")
    num_hops = len(caps) - 1
    weights = weights or {}
    times = times or {}
    seed_time = node_times
    levels = [seeds.astype(jnp.int32)]
    level_counts = [jnp.sum(seeds >= 0).astype(jnp.int32)]
    layouts: List[tuple] = []
    hops: List[Dict[str, HopBlock]] = []
    for h in range(num_hops):
        targets = levels[-1]
        valid_seed = targets >= 0
        safe = jnp.where(valid_seed, targets, 0)
        per_type_out = {}
        all_neighbors = []
        for ei, ename in enumerate(etype_names):
            fan = fanouts[ename]
            if fan is None or fan[h] <= 0:
                continue
            indptr, indices = csrs[ename]
            hkey = jax.random.fold_in(jax.random.fold_in(key, h), ei)
            w = weights.get(ename)
            tm = times.get(ename)
            ind2d = (indices.reshape(-1, 128)
                     if indices.shape[0] % 128 == 0 else None)
            times2d = tm.reshape(-1, 128) if tm is not None else None
            maxdeg = max_degrees[ename]
            et_t = tm if seed_time is not None else None
            st_t = seed_time if tm is not None else None
            if w is not None:
                out = sample_ops.weighted_sample(
                    hkey, indptr, indices, w, safe, fan[h],
                    max_degree=maxdeg, indices2d=ind2d,
                    weights2d=w.reshape(-1, 128),
                    edge_times=et_t, times2d=times2d, seed_time=st_t)
            elif tm is not None and seed_time is not None:
                out = sample_ops.masked_uniform_sample(
                    hkey, indptr, indices, safe, fan[h],
                    max_degree=maxdeg, indices2d=ind2d,
                    edge_times=tm, times2d=times2d,
                    seed_time=seed_time)
            else:
                out = sample_ops.uniform_sample(
                    hkey, indptr, indices, safe, fan[h],
                    indices2d=ind2d, max_degree=maxdeg)
            vm = valid_seed[:, None]
            neighbors = jnp.where(vm, out.neighbors, -1)
            edge_ids = jnp.where(
                vm & (out.edge_ids >= 0), out.edge_ids + edge_bases[ename],
                -1)
            per_type_out[ename] = (neighbors, edge_ids)
            all_neighbors.append(neighbors.reshape(-1))
        if dedup:
            flat = jnp.concatenate(all_neighbors) if all_neighbors else (
                jnp.zeros((0,), jnp.int32))
            uniq = append_unique(targets, flat, max_unique=caps[h + 1])
            # split the neighbor map back per edge type
            blocks = {}
            off = 0
            for ename in etype_names:
                if ename not in per_type_out:
                    continue
                neighbors, edge_ids = per_type_out[ename]
                n = neighbors.size
                nl = uniq.neighbor_map[off: off + n].reshape(
                    neighbors.shape)
                off += n
                blocks[ename] = HopBlock(
                    neigh_local=nl, neigh_global=neighbors,
                    edge_ids=edge_ids)
            hops.append(blocks)
            levels.append(uniq.unique_nodes)
            level_counts.append(
                jnp.sum(uniq.unique_nodes >= 0).astype(jnp.int32))
        else:
            # static layout: [targets | per-etype blocks row-major]
            t = targets.shape[0]
            blocks = {}
            layout = []
            parts = [targets]
            pos_start = t
            for ename in etype_names:
                if ename not in per_type_out:
                    continue
                neighbors, edge_ids = per_type_out[ename]
                f = neighbors.shape[1]
                pos = (pos_start
                       + jnp.arange(t * f, dtype=jnp.int32)).reshape(t, f)
                nl = jnp.where(neighbors >= 0, pos, -1)
                blocks[ename] = HopBlock(
                    neigh_local=nl, neigh_global=neighbors,
                    edge_ids=edge_ids)
                layout.append((ename, pos_start, f))
                parts.append(neighbors.reshape(-1))
                pos_start += t * f
            hops.append(blocks)
            layouts.append(tuple(layout))
            next_level = jnp.concatenate(parts)
            levels.append(next_level)
            level_counts.append(
                jnp.sum(next_level >= 0).astype(jnp.int32))
        if seed_time is not None:
            # sampled nodes inherit their seed's time (min over
            # assignments), as in the homogeneous path; sized to the
            # actual level (== caps[h+1] for dedup, == the positional
            # layout length for dedup=False)
            big = jnp.asarray(jnp.iinfo(jnp.int32).max, seed_time.dtype)
            cap = int(levels[-1].shape[0])
            tf_full = jnp.full((cap,), big, seed_time.dtype)
            tf_full = tf_full.at[: targets.shape[0]].set(seed_time)
            for ename in etype_names:
                if ename not in blocks:
                    continue
                nl = blocks[ename].neigh_local.reshape(-1)
                fanh = fanouts[ename][h]
                flat_t = jnp.repeat(seed_time, fanh)
                ok = nl >= 0
                tf_full = tf_full.at[
                    jnp.where(ok, nl, cap - 1)].min(
                    jnp.where(ok, flat_t, big))
            seed_time = tf_full
    return HeteroMultihopBatch(
        levels=levels, level_counts=level_counts, hops=hops,
        seed_count=level_counts[0],
        layouts=tuple(layouts) if not dedup else ())


def hetero_multihop_batched(key, csrs, seeds, *, etype_names, fanouts,
                            edge_bases, max_degrees, caps=None,
                            weights=None, seed_type=None, dst_types=None,
                            src_types=None) -> HeteroMultihopBatch:
    """S independent hetero mini-batches sampled as ONE flattened
    frontier — the hetero analog of ``multihop_uniform_batched``
    (sampler/neighbor_sampler.py): the per-seed ops (draws, the
    neighbor-id window gathers) are row-rate bound with a per-op ramp,
    so batching S steps into each hop's device pass lifts the sample
    stage the same way the homogeneous fused path does (PERF_NOTES
    round 5; the reference's analog is the bulk sampler's call-group
    batching, ref cugraph_pyg/sampler/distributed_sampler.py:279-343).

    seeds: (S, B) int32; ``caps`` is accepted for signature parity but
    only its length (the hop count) is used — the dedup=False layout's
    capacities are positional.  Every array leaf of the result carries
    a leading step axis (S, ...); slicing step s (or scanning the
    pytree) yields the same static layout ``hetero_multihop(...,
    dedup=False)`` produces for seeds[s] (draw streams differ from S
    separate calls — one fold_in per (hop, etype) across the flattened
    batch — but are iid uniform all the same).  Hand-flattened rather
    than vmapped: a vmap of the per-step sampler batches the window
    gathers into strided forms XLA lowers ~3x slower (measured,
    benchmarks/model_bench.py part B).  Temporal sampling stays on the
    per-step path.

    TYPED target segments (round 5): pass ``seed_type`` plus per-etype
    ``dst_types``/``src_types`` dicts and each edge type samples ONLY
    from the level positions whose node type matches its destination
    type — PyG hetero semantics (an etype expands dst-type nodes
    alone).  The untyped layout sampled every etype from EVERY target,
    relying on degree-0 rows to emit -1s: at ogbn-mag shape ~57% of
    hop-2 slots were typed-mismatch garbage that still paid sampling
    draws and feature-gather rows (measured, PERF_NOTES round 5).
    Typed layout entries carry a 4th field: the segment plan (tuple of
    (segment_length, covered) over the level's positional segments, in
    order), consumed by RGCNConv.typed_call to place per-relation
    aggregates back at their target rows.
    """
    weights = weights or {}
    if caps is not None:
        num_hops = len(caps) - 1
    else:
        num_hops = len(next(f for f in fanouts.values() if f))
    typed = dst_types is not None
    if typed and (seed_type is None or src_types is None):
        raise ValueError("typed sampling needs seed_type, dst_types "
                         "AND src_types")
    s_steps, batch = seeds.shape
    levels = [seeds.astype(jnp.int32)]
    level_counts = [jnp.sum(seeds >= 0, axis=1).astype(jnp.int32)]
    # positional segments of the current level: (start, length, ntype)
    segments = [(0, batch, seed_type)]
    layouts: List[tuple] = []
    hops: List[Dict[str, HopBlock]] = []
    for h in range(num_hops):
        targets = levels[-1]                        # (S, t)
        t = targets.shape[1]
        per_type_out = {}
        for ei, ename in enumerate(etype_names):
            fan = fanouts[ename]
            if fan is None or fan[h] <= 0:
                continue
            if typed:
                segs = [(a, l) for a, l, ty in segments
                        if ty == dst_types[ename]]
                t_e = sum(l for _, l in segs)
                if t_e == 0:
                    continue
                targets_e = (targets[:, segs[0][0]:segs[0][0] + segs[0][1]]
                             if len(segs) == 1 else jnp.concatenate(
                                 [targets[:, a:a + l] for a, l in segs],
                                 axis=1))
                plan = tuple((l, ty == dst_types[ename])
                             for _, l, ty in segments)
            else:
                targets_e, t_e, plan = targets, t, None
            flat = targets_e.reshape(-1)
            valid_seed = flat >= 0
            safe = jnp.where(valid_seed, flat, 0)
            indptr, indices = csrs[ename]
            hkey = jax.random.fold_in(jax.random.fold_in(key, h), ei)
            w = weights.get(ename)
            ind2d = (indices.reshape(-1, 128)
                     if indices.shape[0] % 128 == 0 else None)
            maxdeg = max_degrees[ename]
            if w is not None:
                out = sample_ops.weighted_sample(
                    hkey, indptr, indices, w, safe, fan[h],
                    max_degree=maxdeg, indices2d=ind2d,
                    weights2d=w.reshape(-1, 128))
            else:
                out = sample_ops.uniform_sample(
                    hkey, indptr, indices, safe, fan[h],
                    indices2d=ind2d, max_degree=maxdeg)
            vm = valid_seed[:, None]
            neighbors = jnp.where(vm, out.neighbors, -1).reshape(
                s_steps, t_e, fan[h])
            edge_ids = jnp.where(
                vm & (out.edge_ids >= 0),
                out.edge_ids + edge_bases[ename], -1).reshape(
                s_steps, t_e, fan[h])
            per_type_out[ename] = (neighbors, edge_ids, plan)
        # per-step static layout: [targets | per-etype blocks row-major]
        blocks = {}
        layout = []
        parts = [targets]
        new_segs = []
        pos_start = t
        for ename in etype_names:
            if ename not in per_type_out:
                continue
            neighbors, edge_ids, plan = per_type_out[ename]
            t_e, f = neighbors.shape[1], neighbors.shape[2]
            pos = (pos_start
                   + jnp.arange(t_e * f, dtype=jnp.int32)).reshape(t_e, f)
            nl = jnp.where(neighbors >= 0, pos[None], -1)
            blocks[ename] = HopBlock(
                neigh_local=nl, neigh_global=neighbors,
                edge_ids=edge_ids)
            layout.append((ename, pos_start, f) if plan is None
                          else (ename, pos_start, f, plan))
            parts.append(neighbors.reshape(s_steps, t_e * f))
            if typed:
                new_segs.append((pos_start, t_e * f, src_types[ename]))
            pos_start += t_e * f
        hops.append(blocks)
        layouts.append(tuple(layout))
        segments = segments + new_segs
        next_level = jnp.concatenate(parts, axis=1)
        levels.append(next_level)
        level_counts.append(
            jnp.sum(next_level >= 0, axis=1).astype(jnp.int32))
    return HeteroMultihopBatch(
        levels=levels, level_counts=level_counts, hops=hops,
        seed_count=level_counts[0], layouts=tuple(layouts))
