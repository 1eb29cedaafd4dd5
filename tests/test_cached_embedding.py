"""Trainable device-cached host embedding + host-managed cache.

ref cpp/src/wholememory/embedding.cpp:556-761 device_cached_host_embedding,
cpp/src/wholememory_ops/functions/embedding_cache_func.cuh:55-353
(modified bits / writeback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.embedding import CachedHostEmbedding, HostManagedCache
from cugraph_gnn_tpu.embedding.optimizers import UPDATE_FNS


@pytest.fixture()
def host_store(rng):
    return rng.standard_normal((500, 16)).astype(np.float32)


def test_cache_gather_parity(host_store, rng):
    cache = HostManagedCache(host_store.copy(), capacity=128, ways=8)
    for i in range(6):
        ids = rng.integers(0, 500, 64).astype(np.int64)
        ids[0] = -1
        out = np.asarray(cache.gather(ids))
        expect = np.where((ids >= 0)[:, None],
                          host_store[np.clip(ids, 0, None)], 0)
        np.testing.assert_allclose(out, expect, rtol=1e-6)
    assert cache.hits > 0 and cache.misses > 0


def test_cache_hit_rate_rises_on_hot_set(host_store, rng):
    cache = HostManagedCache(host_store.copy(), capacity=256, ways=8)
    hot = rng.integers(0, 500, 48).astype(np.int64)
    for _ in range(10):
        cache.gather(hot)
    # after warmup, the hot set should be (nearly) fully resident
    h0, m0 = cache.hits, cache.misses
    cache.gather(hot)
    assert cache.misses - m0 <= 2, (cache.hits - h0, cache.misses - m0)


def test_cache_prefetch_overlap(host_store, rng):
    c1 = HostManagedCache(host_store.copy(), capacity=128, ways=8)
    c2 = HostManagedCache(host_store.copy(), capacity=128, ways=8)
    batches = [rng.integers(0, 500, 64).astype(np.int64) for _ in range(5)]
    outs1 = [np.asarray(c1.gather(b)) for b in batches]
    c2.prefetch(batches[0])
    outs2 = []
    for i, b in enumerate(batches):
        out = c2.gather(b)
        if i + 1 < len(batches):
            c2.prefetch(batches[i + 1])
        outs2.append(np.asarray(out))
    for a, b in zip(outs1, outs2):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_cache_prefetch_mismatch_is_safe(host_store, rng):
    cache = HostManagedCache(host_store.copy(), capacity=128, ways=8)
    a = rng.integers(0, 500, 32).astype(np.int64)
    b = rng.integers(0, 500, 32).astype(np.int64)
    cache.prefetch(a)
    out_b = np.asarray(cache.gather(b))          # different ids
    np.testing.assert_allclose(out_b, host_store[b], rtol=1e-6)
    out_a = np.asarray(cache.gather(a))          # a was still inserted
    np.testing.assert_allclose(out_a, host_store[a], rtol=1e-6)


def test_update_marks_dirty_and_flush_writes_back(host_store):
    host = host_store.copy()
    cache = HostManagedCache(host, capacity=128, ways=8)
    ids = np.arange(20, dtype=np.int64)
    cache.gather(ids)                            # now cached
    new_vals = jnp.ones((20, 16), jnp.float32) * 7.0
    cache.update(ids, new_vals)
    # host rows are STALE until flush (writeback discipline)
    cached_mask = cache.tags[cache._set_of(ids)] == ids[:, None]
    in_cache = cached_mask.any(1)
    assert in_cache.any()
    stale = host[ids[in_cache]]
    np.testing.assert_allclose(stale, host_store[ids[in_cache]], rtol=1e-6)
    # but gather returns the NEW values (from cache)
    out = np.asarray(cache.gather(ids))
    np.testing.assert_allclose(out[in_cache], 7.0)
    cache.flush()
    np.testing.assert_allclose(host[ids[in_cache]], 7.0)
    assert not cache.modified.any()


def test_eviction_writes_back_dirty_rows(rng):
    host = rng.standard_normal((400, 8)).astype(np.float32)
    # tiny cache: plenty of evictions
    cache = HostManagedCache(host, capacity=32, ways=4)
    ids = np.arange(16, dtype=np.int64)
    cache.gather(ids)
    cache.update(ids, jnp.full((16, 8), 3.0, jnp.float32))
    # hammer with other ids until the dirty rows are evicted
    for i in range(30):
        cache.gather(rng.integers(16, 400, 64).astype(np.int64))
    cache.flush()
    np.testing.assert_allclose(host[:16], 3.0)


def test_cached_embedding_trains_vs_reference_math(rng):
    n, f, b = 300, 8, 32
    table0 = rng.standard_normal((n, f)).astype(np.float32)
    emb = CachedHostEmbedding(table0.copy(), optimizer="adagrad",
                              cache_ratio=0.3, ways=8)
    ids = rng.integers(0, n, b).astype(np.int64)
    rows = np.asarray(emb.gather(ids))
    np.testing.assert_allclose(rows, table0[ids], rtol=1e-6)
    grads = rng.standard_normal((b, f)).astype(np.float32)
    emb.add_gradients(ids, grads)
    emb.apply_gradients(lr=0.1)
    emb.flush()
    # reference math: dedup (sum grads per unique id) + adagrad
    uids = np.unique(ids)
    gsum = np.zeros((len(uids), f), np.float32)
    for i, g in zip(ids, grads):
        gsum[np.searchsorted(uids, i)] += g
    exp_rows, exp_state = UPDATE_FNS["adagrad"](
        jnp.asarray(table0[uids]), jnp.asarray(gsum),
        {"state_sum": jnp.zeros((len(uids), f))}, lr=0.1)
    np.testing.assert_allclose(emb.host_table[uids], np.asarray(exp_rows),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(emb._state["state_sum"][uids],
                               np.asarray(exp_state["state_sum"]),
                               rtol=1e-5, atol=1e-6)


def test_cached_embedding_end_to_end_training(rng):
    """papers100M-shaped: table larger than the cache; training via the
    tap autograd path updates host rows (after flush) and reduces loss."""
    n, f, b = 2000, 16, 64
    emb = CachedHostEmbedding(
        (0.1 * rng.standard_normal((n, f))).astype(np.float32),
        optimizer="sgd", cache_ratio=0.05, ways=8)
    w = jnp.asarray(rng.standard_normal((f,)).astype(np.float32))
    targets_all = rng.standard_normal(n).astype(np.float32)

    @jax.jit
    def fwd(rows, tap, tgt):
        pred = (rows + tap) @ w
        return jnp.mean((pred - tgt) ** 2)

    host_before = emb.host_table.copy()
    losses = []
    for step in range(60):
        ids = rng.integers(0, n, b).astype(np.int64)
        rows = emb.gather(ids)
        tap = emb.make_tap(b)
        tgt = jnp.asarray(targets_all[ids])
        loss, g_tap = jax.value_and_grad(fwd, argnums=1)(rows, tap, tgt)
        emb.add_gradients(ids, g_tap)
        emb.apply_gradients(lr=0.5)
        losses.append(float(loss))
    emb.flush()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses
    assert (emb.host_table != host_before).any()
    assert emb.hit_rate > 0
