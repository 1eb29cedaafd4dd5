"""Trainable device-cached host embedding.

TPU-native equivalent of the reference's ``device_cached_host_embedding``
(ref cpp/src/wholememory/embedding.cpp:556-761: host-resident table,
set-associative device cache with valid/modified tag bits, writeback on
eviction + flush; cache kernels ref
cpp/src/wholememory_ops/functions/embedding_cache_func.cuh:55-353).

TPU redesign — **host-managed tags, device-resident rows**:

* The CUDA cache keeps tags in device memory and runs warp-cooperative
  tag matching; every miss decision happens on-GPU.  On TPU a device-side
  tag probe would force a device->host readback of the hit mask every
  batch to drive the host fetch (the round-1 design's flaw).  Instead the
  tag/LFU/modified metadata lives in HOST numpy arrays: hit/miss
  planning, eviction choice, and aging are cheap vectorized host work,
  and the device only ever executes fixed-shape programs (one fused
  "combine hits + insert misses" per gather).  No readback on the read
  path at all.
* Modified bits: trained rows are written into the cache slot and marked
  dirty on the host bitmap; host rows stay stale until the slot is
  evicted (writeback happens then) or :meth:`flush` — exactly the
  reference's writeback discipline (ref embedding_cache_func.cuh:132-139
  CacheLineInfo::set_modified / WriteBackCacheDirect).
* Prefetch: :meth:`prefetch` runs the next batch's plan + host row fetch
  in a worker thread so the host fetch overlaps device compute
  (double-buffered input pipeline; the reference gets the same overlap
  from CUDA streams).
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.embedding import optimizers as opt_mod


def _pow2_at_least(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


@functools.partial(jax.jit, donate_argnums=(0,))
def _combine_and_insert(rows, s, w, use_cache, upload, ins_s, ins_w,
                        ins_vals):
    """out[i] = cache hit ? rows[s,w] : upload[i]; then insert miss rows
    at their (pre-assigned) slots.  ins_s == sets (out of range) drops."""
    hit_rows = rows[jnp.minimum(s, rows.shape[0] - 1), w]
    out = jnp.where(use_cache[:, None], hit_rows, upload)
    rows = rows.at[ins_s, ins_w].set(ins_vals.astype(rows.dtype),
                                     mode="drop")
    return rows, out


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_slots(rows, s, w, vals):
    return rows.at[s, w].set(vals.astype(rows.dtype), mode="drop")


class _Plan:
    __slots__ = ("ids_key", "s", "w", "use_cache", "upload", "ins_s",
                 "ins_w", "ins_vals", "evict_s", "evict_w", "evict_ids")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


class HostManagedCache:
    """Set-associative LFU cache: host tags/freq/modified + device rows.

    host_rows may be any row-indexable host store (numpy array or
    memmap).  All metadata ops are host-side; the device executes one
    fused gather+insert per batch (no device->host sync on reads).
    """

    def __init__(self, host_rows, capacity: int, ways: int = 8,
                 dtype=None):
        self.host_rows = host_rows
        n, f = host_rows.shape
        self.num_rows = n
        self.dim = f
        self.ways = ways
        self.sets = max(capacity // ways, 1)
        dtype = dtype or host_rows.dtype
        self.rows = jnp.zeros((self.sets, ways, f), dtype)
        self.tags = np.full((self.sets, ways), -1, np.int64)
        self.freq = np.zeros((self.sets, ways), np.int32)
        self.modified = np.zeros((self.sets, ways), bool)
        self.hits = 0
        self.misses = 0
        self._prefetched: Optional[Tuple[threading.Thread, _Plan]] = None

    # -- host-side planning --------------------------------------------------

    def _set_of(self, ids: np.ndarray) -> np.ndarray:
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B1)) >> np.uint64(8)
        return (h % np.uint64(self.sets)).astype(np.int64)

    def _plan(self, ids: np.ndarray) -> _Plan:
        """Hit/miss + slot assignment + eviction bookkeeping; mutates the
        host metadata (tags/freq/modified) to the post-batch state."""
        ids = np.asarray(ids).astype(np.int64).ravel()
        b = ids.shape[0]
        valid = (ids >= 0) & (ids < self.num_rows)
        # within-batch dedup: duplicate ids share one lookup/insert
        uids, inv = np.unique(np.where(valid, ids, -1), return_inverse=True)
        uvalid = uids >= 0
        s = np.where(uvalid, self._set_of(np.maximum(uids, 0)), 0)
        eq = self.tags[s] == uids[:, None]            # (U, W)
        hit = eq.any(1) & uvalid
        way = np.where(hit, eq.argmax(1), 0)
        np.add.at(self.freq, (s[hit], way[hit]), 1)
        self.hits += int(valid.sum() - (~hit[inv] & valid).sum())

        miss = uvalid & ~hit
        self.misses += int((miss[inv] & valid).sum())
        m_idx = np.nonzero(miss)[0]
        ins_s = ins_w = np.zeros((0,), np.int64)
        ins_pos = np.zeros((0,), np.int64)
        ev_s = ev_w = np.zeros((0,), np.int64)
        ev_ids = np.zeros((0,), np.int64)
        if len(m_idx):
            ms = s[m_idx]
            # age touched sets once per batch so stale-hot entries decay
            self.freq[np.unique(ms)] = np.maximum(
                self.freq[np.unique(ms)] - 1, 0)
            # occurrence rank of each miss within its set
            order = np.argsort(ms, kind="stable")
            ms_sorted = ms[order]
            first = np.searchsorted(ms_sorted, ms_sorted, side="left")
            rank = np.empty(len(ms), np.int64)
            rank[order] = np.arange(len(ms)) - first
            way_order = np.argsort(self.freq[ms], axis=1, kind="stable")
            mway = way_order[np.arange(len(ms)), rank % self.ways]
            # only genuinely cold ways are replaced; hot residents and
            # overflow ranks bypass the cache for this batch
            eligible = (rank < self.ways) & (self.freq[ms, mway] <= 1)
            e = np.nonzero(eligible)[0]
            ins_s, ins_w = ms[e], mway[e]
            ins_pos = m_idx[e]                     # position in uids
            old = self.tags[ins_s, ins_w]
            dirty = (old >= 0) & self.modified[ins_s, ins_w]
            ev_s, ev_w = ins_s[dirty], ins_w[dirty]
            ev_ids = old[dirty]
            self.tags[ins_s, ins_w] = uids[ins_pos]
            self.freq[ins_s, ins_w] = 1
            self.modified[ins_s, ins_w] = False
            way[ins_pos] = ins_w
        # per-original-position views
        dt = getattr(self.host_rows, "dtype", np.float32)
        fetched = np.zeros((b, self.dim), dt)
        ins_vals = np.zeros((0, self.dim), dt)
        if len(m_idx):
            rows_np = np.asarray(
                self.host_rows[np.maximum(uids[m_idx], 0)])
            fetched_u = np.zeros((len(uids), self.dim), rows_np.dtype)
            fetched_u[m_idx] = rows_np
            fetched = fetched_u[inv]
            ins_vals = fetched_u[ins_pos]
        return _Plan(
            ids_key=ids,
            s=s[inv], w=way[inv],
            use_cache=(hit[inv] & valid),
            upload=np.where(valid[:, None], fetched, 0),
            ins_s=ins_s, ins_w=ins_w, ins_vals=ins_vals,
            evict_s=ev_s, evict_w=ev_w, evict_ids=ev_ids)

    def _writeback(self, s: np.ndarray, w: np.ndarray, ids: np.ndarray):
        """Read dirty slots from the device and write them to host rows
        (must run BEFORE the slots are overwritten)."""
        if not len(ids):
            return
        cap = _pow2_at_least(len(ids), max(len(ids), 1))
        pad = cap - len(ids)
        sp = np.concatenate([s, np.zeros(pad, np.int64)])
        wp = np.concatenate([w, np.zeros(pad, np.int64)])
        vals = np.asarray(self.rows[jnp.asarray(sp), jnp.asarray(wp)])
        self.host_rows[ids] = vals[: len(ids)]

    # -- public API ----------------------------------------------------------

    def gather(self, ids) -> jax.Array:
        """rows = store[ids] through the cache; -1 pads yield zeros.
        Consumes a matching :meth:`prefetch` plan if one is pending."""
        ids_np = np.asarray(ids).astype(np.int64).ravel()
        plan = self._take_prefetched(ids_np)
        if plan is None:
            plan = self._plan(ids_np)
        return self._apply_plan(plan)

    def _apply_plan(self, plan: _Plan) -> jax.Array:
        self._writeback(plan.evict_s, plan.evict_w, plan.evict_ids)
        b = len(plan.ids_key)
        ins_cap = _pow2_at_least(max(len(plan.ins_s), 1), max(b, 1))
        pad = ins_cap - len(plan.ins_s)
        ins_s = np.concatenate(
            [plan.ins_s, np.full(pad, self.sets, np.int64)])
        ins_w = np.concatenate([plan.ins_w, np.zeros(pad, np.int64)])
        ins_vals = np.zeros((ins_cap, self.dim), plan.upload.dtype)
        ins_vals[: len(plan.ins_vals)] = plan.ins_vals
        self.rows, out = _combine_and_insert(
            self.rows,
            jnp.asarray(plan.s), jnp.asarray(plan.w),
            jnp.asarray(plan.use_cache), jnp.asarray(plan.upload),
            jnp.asarray(ins_s), jnp.asarray(ins_w), jnp.asarray(ins_vals))
        return out

    def prefetch(self, ids):
        """Plan + host-row-fetch for the NEXT gather in a worker thread
        (overlaps the host fetch with device compute).  The plan mutates
        tag metadata eagerly; if the next gather asks for different ids,
        the pending plan's inserts are completed first so metadata and
        device rows stay consistent."""
        ids_np = np.asarray(ids).astype(np.int64).ravel()
        holder: List[Optional[_Plan]] = [None]

        def work():
            holder[0] = self._plan(ids_np)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prefetched = (t, holder, ids_np)

    def _take_prefetched(self, ids_np) -> Optional[_Plan]:
        if self._prefetched is None:
            return None
        t, holder, key = self._prefetched
        self._prefetched = None
        t.join()
        if np.array_equal(key, ids_np):
            return holder[0]
        # different ids: finish the prefetched batch's inserts, then
        # let the caller re-plan for its own ids
        self._apply_plan(holder[0])
        return None

    def _drain_prefetch(self):
        """Complete any pending prefetched gather.  Mutating ops (update/
        flush/drop_all) must drain first: the pending plan's device
        inserts would otherwise overwrite slots written after the plan
        was made."""
        if self._prefetched is not None:
            t, holder, _ = self._prefetched
            self._prefetched = None
            t.join()
            self._apply_plan(holder[0])

    def update(self, ids, new_rows: jax.Array):
        """Write trained rows: cached ids update their slot and turn the
        modified bit on (host rows stay stale until eviction/flush);
        uncached ids write through to the host store."""
        self._drain_prefetch()
        ids = np.asarray(ids).astype(np.int64).ravel()
        b = len(ids)
        valid = (ids >= 0) & (ids < self.num_rows)
        s = np.where(valid, self._set_of(np.maximum(ids, 0)), 0)
        eq = self.tags[s] == ids[:, None]
        hit = eq.any(1) & valid
        way = np.where(hit, eq.argmax(1), 0)
        s_dev = np.where(hit, s, self.sets)     # non-hits drop
        self.rows = _scatter_slots(
            self.rows, jnp.asarray(s_dev), jnp.asarray(way), new_rows)
        self.modified[s[hit], way[hit]] = True
        stale = np.nonzero(valid & ~hit)[0]
        if len(stale):
            cap = _pow2_at_least(len(stale), b)
            idx = np.concatenate(
                [stale, np.zeros(cap - len(stale), np.int64)])
            vals = np.asarray(new_rows[jnp.asarray(idx)])
            self.host_rows[ids[stale]] = vals[: len(stale)].astype(
                np.asarray(self.host_rows[:1]).dtype)

    def flush(self):
        """Write every modified slot back to the host store and clear the
        dirty bits (ref embedding.cpp flush/writeback_all_cache before
        checkpoint)."""
        self._drain_prefetch()
        ds, dw = np.nonzero(self.modified)
        self._writeback(ds, dw, self.tags[ds, dw])
        self.modified[:] = False

    def drop_all(self):
        self.flush()
        self.tags[:] = -1
        self.freq[:] = 0
        self.hits = 0
        self.misses = 0

    @property
    def hit_rate(self) -> float:
        t = self.hits + self.misses
        return self.hits / t if t else 0.0


class CachedHostEmbedding:
    """Trainable embedding whose table lives in HOST memory behind a
    device cache — for tables larger than HBM (papers100M scale).

    ref embedding.cpp:556-761 device_cached_host_embedding +
    torch/embedding.py create_embedding(cache_policy=...).

    Training flow matches DistEmbedding: ``gather`` -> grads on the rows
    (tap trick or manual) -> ``add_gradients`` -> ``apply_gradients``.
    The sparse update runs on device over the deduped touched rows; the
    updated rows land in the cache (dirty) and write back lazily.
    Optimizer state is host-resident (uncached, like the reference's
    separate optimizer-state wholememory tensors) and is streamed
    up/back per step.
    """

    def __init__(self, host_table: np.ndarray, optimizer: str = "sgd",
                 hyper: Optional[dict] = None, capacity: Optional[int] = None,
                 cache_ratio: float = 0.2, ways: int = 8, dtype=None):
        self.host_table = host_table
        n, dim = host_table.shape
        self.num_embeddings = n
        self.dim = dim
        cap = capacity or max(int(n * cache_ratio), ways)
        self.cache = HostManagedCache(host_table, cap, ways=ways,
                                      dtype=dtype)
        self.optimizer = optimizer
        self.hyper = dict(hyper or {})
        spec = opt_mod.SPECS[optimizer]
        self._state: Dict[str, np.ndarray] = {
            k: np.zeros((n, dim * w if w > 0 else 1), np.float32)
            for k, w in spec.state_widths.items()
        }
        self._update = jax.jit(
            functools.partial(self._update_impl,
                              fn=opt_mod.UPDATE_FNS[optimizer]),
            static_argnames=("fn",))
        self._pending: List[Tuple[jax.Array, jax.Array]] = []

    @staticmethod
    def _update_impl(rows, grads, state, valid, lr, *, fn, **hyper):
        new_rows, new_state = fn(rows, grads, state, lr=lr, **hyper)
        keep = valid[:, None]
        new_rows = jnp.where(keep, new_rows, rows)
        new_state = {k: jnp.where(keep, v, state[k])
                     for k, v in new_state.items()}
        return new_rows, new_state

    # -- lookup --------------------------------------------------------------

    def gather(self, ids) -> jax.Array:
        return self.cache.gather(ids)

    def prefetch(self, ids):
        self.cache.prefetch(ids)

    def make_tap(self, batch_size: int):
        """Zero (B, dim) tap; its jax.grad is the per-row gradient (same
        autograd contract as DistEmbedding.make_tap)."""
        return jnp.zeros((batch_size, self.dim), self.cache.rows.dtype)

    # -- training ------------------------------------------------------------

    def add_gradients(self, ids, grads):
        self._pending.append((jnp.asarray(ids, jnp.int32),
                              jnp.asarray(grads)))

    def apply_gradients(self, lr: float):
        """Dedup -> rows through the cache -> device optimizer update ->
        dirty write into the cache; host optimizer state streamed."""
        if not self._pending:
            return
        from cugraph_gnn_tpu.embedding.embedding import dedup_ids_grads
        ids = jnp.concatenate([p[0] for p in self._pending])
        grads = jnp.concatenate([p[1] for p in self._pending])
        self._pending.clear()
        uids, ugrads = dedup_ids_grads(ids, grads)
        uids_np = np.asarray(uids).astype(np.int64)
        valid = uids_np >= 0
        rows = self.cache.gather(uids)
        safe = np.where(valid, uids_np, 0)
        state = {k: jnp.asarray(v[safe]) for k, v in self._state.items()}
        hyper = {k: v for k, v in self.hyper.items()}
        new_rows, new_state = self._update(
            rows, ugrads, state, jnp.asarray(valid),
            jnp.float32(lr), **hyper)
        self.cache.update(uids_np, new_rows)
        for k, v in new_state.items():
            self._state[k][safe[valid]] = np.asarray(v)[valid]

    def flush(self):
        """Write all dirty cached rows to the host table (call before
        checkpointing host_table)."""
        self.cache.flush()

    @property
    def hit_rate(self) -> float:
        return self.cache.hit_rate
