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

    @property
    def num_hops(self) -> int:
        return len(self.hops)

    @property
    def input_nodes(self):
        return self.levels[-1]

    def dst_activations(self, h, hop_index: int):
        """Level-l target rows of the level-(l+1) activation array
        (blockwise prefix when sharded)."""
        from cugraph_gnn_tpu.sampler.output import shard_prefix
        blocks = self.hops[hop_index]
        s_l = next(iter(blocks.values())).neigh_local.shape[0]
        return shard_prefix(h, s_l, self.num_shards)

    def gather_neighbors(self, h, hop_index: int, etype: str):
        """Neighbor activations for one edge type's block of hop l
        (shard-relative indices handled; mask with the block's mask)."""
        from cugraph_gnn_tpu.sampler.output import shard_gather
        return shard_gather(h, self.hops[hop_index][etype].neigh_local,
                            self.num_shards)


jax.tree_util.register_pytree_node(
    HeteroMultihopBatch,
    lambda b: ((b.levels, b.level_counts, b.hops, b.seed_count),
               b.num_shards),
    lambda aux, c: HeteroMultihopBatch(*c, num_shards=aux),
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
                 max_unique_per_hop: Optional[Sequence[int]] = None):
        from cugraph_gnn_tpu.ops.window_gather import pad_to_lines
        self.graph = graph
        self.etypes = list(graph.etypes)
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
        caps = self._level_caps(batch_size)
        seed_time = node_times
        levels = [seeds.astype(jnp.int32)]
        level_counts = [jnp.sum(seeds >= 0).astype(jnp.int32)]
        hops: List[Dict[str, HopBlock]] = []
        for h in range(self.num_hops):
            targets = levels[-1]
            valid_seed = targets >= 0
            safe = jnp.where(valid_seed, targets, 0)
            per_type_out = {}
            all_neighbors = []
            for ei, et in enumerate(self.etypes):
                ename = _etype_str(et)
                fan = self.fanouts[ename]
                if fan is None or fan[h] <= 0:
                    continue
                indptr, indices, edge_base = self.graph.csr_by_etype[et]
                hkey = jax.random.fold_in(jax.random.fold_in(key, h), ei)
                w = self.weights.get(ename)
                times = self.times.get(ename)
                ind2d = (indices.reshape(-1, 128)
                         if indices.shape[0] % 128 == 0 else None)
                times2d = (times.reshape(-1, 128)
                           if times is not None else None)
                maxdeg = self.graph.max_degree_by_etype[et]
                et_t = times if seed_time is not None else None
                st_t = seed_time if times is not None else None
                if w is not None:
                    out = sample_ops.weighted_sample(
                        hkey, indptr, indices, w, safe, fan[h],
                        max_degree=maxdeg, indices2d=ind2d,
                        weights2d=w.reshape(-1, 128),
                        edge_times=et_t, times2d=times2d, seed_time=st_t)
                elif times is not None and seed_time is not None:
                    out = sample_ops.masked_uniform_sample(
                        hkey, indptr, indices, safe, fan[h],
                        max_degree=maxdeg, indices2d=ind2d,
                        edge_times=times, times2d=times2d,
                        seed_time=seed_time)
                else:
                    out = sample_ops.uniform_sample(
                        hkey, indptr, indices, safe, fan[h],
                        indices2d=ind2d, max_degree=maxdeg)
                vm = valid_seed[:, None]
                neighbors = jnp.where(vm, out.neighbors, -1)
                edge_ids = jnp.where(
                    vm & (out.edge_ids >= 0), out.edge_ids + edge_base, -1)
                per_type_out[ename] = (neighbors, edge_ids)
                all_neighbors.append(neighbors.reshape(-1))
            flat = jnp.concatenate(all_neighbors) if all_neighbors else (
                jnp.zeros((0,), jnp.int32))
            uniq = append_unique(targets, flat, max_unique=caps[h + 1])
            # split the neighbor map back per edge type
            blocks = {}
            off = 0
            for et in self.etypes:
                ename = _etype_str(et)
                if ename not in per_type_out:
                    continue
                neighbors, edge_ids = per_type_out[ename]
                n = neighbors.size
                nl = uniq.neighbor_map[off: off + n].reshape(neighbors.shape)
                off += n
                blocks[ename] = HopBlock(
                    neigh_local=nl, neigh_global=neighbors, edge_ids=edge_ids)
            hops.append(blocks)
            levels.append(uniq.unique_nodes)
            level_counts.append(
                jnp.sum(uniq.unique_nodes >= 0).astype(jnp.int32))
            if seed_time is not None:
                # sampled nodes inherit their seed's time (min over
                # assignments), as in the homogeneous path
                big = jnp.asarray(jnp.iinfo(jnp.int32).max, seed_time.dtype)
                cap = caps[h + 1]
                tf_full = jnp.full((cap,), big, seed_time.dtype)
                tf_full = tf_full.at[: targets.shape[0]].set(seed_time)
                for et in self.etypes:
                    ename = _etype_str(et)
                    if ename not in blocks:
                        continue
                    nl = blocks[ename].neigh_local.reshape(-1)
                    fanh = self.fanouts[ename][h]
                    flat_t = jnp.repeat(seed_time, fanh)
                    ok = nl >= 0
                    tf_full = tf_full.at[
                        jnp.where(ok, nl, cap - 1)].min(
                        jnp.where(ok, flat_t, big))
                seed_time = tf_full
        return HeteroMultihopBatch(
            levels=levels, level_counts=level_counts, hops=hops,
            seed_count=level_counts[0])

    def sample(self, key, seeds, node_times=None) -> HeteroMultihopBatch:
        return self._sample_jit(
            key, seeds, node_times, batch_size=int(seeds.shape[0]))
