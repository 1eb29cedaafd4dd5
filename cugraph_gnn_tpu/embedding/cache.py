"""Device-side feature/embedding cache (set-associative LFU).

TPU-native equivalent of the reference's embedding cache
(ref cpp/src/wholememory_ops/functions/embedding_cache_func.cuh:55-353:
32-way set-associative sets, packed tag word with valid/modified bits +
scaled LFU counter, warp-cooperative top-K recache; management ref
cpp/src/wholememory/embedding_cache.{hpp,cpp}; policy builders ref
pylibwholegraph/torch/embedding.py:124-216).

Use case (matches `device_cached_host_embedding`, ref embedding.cpp:556):
features too large for HBM stay in host RAM; a static-capacity cache in
device HBM holds hot rows.  TPU redesign:

* The cache is two device arrays: ``rows (sets, ways, F)`` and a tag
  store ``tags (sets, ways)`` + ``freq (sets, ways)`` — no packed bit
  tricks needed (HBM arrays, vector ops).
* Lookup is pure jnp (hash -> set, compare tags across ways).
* Miss handling splits device/host: the device reports misses, the host
  fetches rows from its memory-mapped store, and a jitted update inserts
  them with an LFU eviction (lowest counter way, counters decayed on
  insert — the analog of the reference's scaled counter).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CachePolicy:
    """API-parity cache policy (ref torch/embedding.py builders
    create_builtin_cache_policy none/local_device/local_node/all_devices).

    On TPU "node"/"device" placement collapses to capacity selection:
    the cache lives in the local chip's HBM either way.
    """

    kind: str = "local_device"     # none|local_device|local_node|all_devices
    cache_ratio: float = 0.2
    ways: int = 32

    def capacity_for(self, num_rows: int) -> int:
        if self.kind == "none":
            return 0
        return max(int(num_rows * self.cache_ratio), self.ways)


class DeviceLFUCache:
    """Set-associative LFU cache over a host-resident row store."""

    def __init__(self, host_rows: np.ndarray, capacity: int,
                 ways: int = 8, dtype=None):
        self.host_rows = np.asarray(host_rows)
        n, f = self.host_rows.shape
        self.num_rows = n
        self.ways = ways
        self.sets = max(capacity // ways, 1)
        dtype = dtype or self.host_rows.dtype
        self.rows = jnp.zeros((self.sets, ways, f), dtype)
        self.tags = jnp.full((self.sets, ways), -1, jnp.int32)
        self.freq = jnp.zeros((self.sets, ways), jnp.int32)
        self._lookup = jax.jit(self._lookup_impl)
        self._insert = jax.jit(self._insert_impl)
        self.hits = 0
        self.misses = 0

    # -- device-side pieces --------------------------------------------------

    def _set_of(self, ids):
        # cheap multiplicative hash -> set index
        h = (ids.astype(jnp.uint32) * np.uint32(0x9E3779B1)) >> np.uint32(8)
        return (h % np.uint32(self.sets)).astype(jnp.int32)

    def _lookup_impl(self, rows, tags, freq, ids):
        s = self._set_of(ids)                       # (B,)
        set_tags = tags[s]                          # (B, W)
        hit_way = jnp.argmax(set_tags == ids[:, None], axis=1)
        hit = jnp.take_along_axis(
            set_tags, hit_way[:, None], axis=1)[:, 0] == ids
        hit &= ids >= 0
        out = rows[s, hit_way]                      # (B, F)
        out = jnp.where(hit[:, None], out, 0)
        # bump LFU counters for hits
        freq = freq.at[s, hit_way].add(hit.astype(jnp.int32))
        return out, hit, freq

    def _insert_impl(self, rows, tags, freq, ids, new_rows):
        """Insert miss rows: evict the lowest-frequency way per set
        (ref CacheSetUpdater top-K recache).  Ids from the same batch
        mapping to one set take successive ways (occurrence rank added
        to the victim way) so a batch can fill a whole set."""
        s = self._set_of(ids)
        ok = ids >= 0
        s_safe = jnp.where(ok, s, 0)
        # occurrence rank of each id within its set (sort-based)
        order = jnp.argsort(s, stable=True)
        s_sorted = s[order]
        first = jnp.searchsorted(s_sorted, s_sorted, side="left")
        rank_sorted = jnp.arange(s.shape[0], dtype=jnp.int32) - first
        rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
        # age each touched set once per batch (the analog of the
        # reference's scaled-down LFU counter) so stale-hot entries
        # eventually become evictable
        dec = jnp.where(ok & (rank == 0), 1, 0)
        freq = jnp.maximum(freq.at[s_safe].add(-dec[:, None]), 0)
        # rank-th coldest way per candidate; only genuinely cold ways
        # (aged freq <= 1) are replaced — hot residents survive
        way_order = jnp.argsort(freq[s_safe], axis=1)      # (B, W)
        way = jnp.take_along_axis(
            way_order, (rank % self.ways)[:, None], axis=1)[:, 0]
        eligible = ok & (freq[s_safe, way] <= 1)
        rows = rows.at[s_safe, way].set(
            jnp.where(eligible[:, None], new_rows.astype(rows.dtype),
                      rows[s_safe, way]))
        tags = tags.at[s_safe, way].set(
            jnp.where(eligible, ids, tags[s_safe, way]))
        freq = freq.at[s_safe, way].set(
            jnp.where(eligible, 1, freq[s_safe, way]))
        return rows, tags, freq

    # -- public API ----------------------------------------------------------

    def gather(self, ids) -> jax.Array:
        """rows = store[ids] through the cache.  ids: (B,) int32 device
        or host array; -1 padding yields zero rows."""
        ids = jnp.asarray(ids, jnp.int32)
        out, hit, self.freq = self._lookup(self.rows, self.tags, self.freq,
                                           ids)
        hit_np = np.asarray(hit)
        ids_np = np.asarray(ids)
        miss_mask = (~hit_np) & (ids_np >= 0)
        self.hits += int(hit_np.sum())
        self.misses += int(miss_mask.sum())
        if miss_mask.any():
            miss_ids = np.where(miss_mask, ids_np, -1).astype(np.int32)
            fetched = np.where(
                miss_mask[:, None],
                self.host_rows[np.clip(ids_np, 0, self.num_rows - 1)],
                0).astype(self.host_rows.dtype)
            self.rows, self.tags, self.freq = self._insert(
                self.rows, self.tags, self.freq, jnp.asarray(miss_ids),
                jnp.asarray(fetched))
            out = jnp.where(jnp.asarray(miss_mask)[:, None],
                            jnp.asarray(fetched), out)
        return out

    @property
    def hit_rate(self) -> float:
        t = self.hits + self.misses
        return self.hits / t if t else 0.0

    def drop_all(self):
        """Invalidate everything (ref embedding_cache.hpp drop-all)."""
        self.tags = jnp.full_like(self.tags, -1)
        self.freq = jnp.zeros_like(self.freq)
        self.hits = 0
        self.misses = 0
