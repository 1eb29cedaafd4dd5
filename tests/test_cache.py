"""Device LFU cache tests (ref cpp/tests/wholememory_ops/cacheset_tests.cu
strategy: correctness vs direct store access + eviction behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.embedding.cache import CachePolicy, DeviceLFUCache


def test_cache_policy_capacity():
    p = CachePolicy(kind="local_device", cache_ratio=0.25)
    assert p.capacity_for(1000) == 250
    assert CachePolicy(kind="none").capacity_for(1000) == 0


def test_cache_correctness(rng):
    n, f = 256, 16
    host = rng.standard_normal((n, f)).astype(np.float32)
    cache = DeviceLFUCache(host, capacity=64, ways=4)
    for trial in range(5):
        ids = rng.integers(0, n, 40).astype(np.int32)
        ids[::7] = -1
        out = np.asarray(cache.gather(ids))
        expect = np.where((ids >= 0)[:, None],
                          host[np.clip(ids, 0, None)], 0)
        np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_cache_hits_on_repeat(rng):
    n, f = 512, 8
    host = rng.standard_normal((n, f)).astype(np.float32)
    cache = DeviceLFUCache(host, capacity=128, ways=8)
    hot = rng.choice(n, 32, replace=False).astype(np.int32)
    cache.gather(hot)           # cold misses
    m0 = cache.misses
    for _ in range(5):
        out = np.asarray(cache.gather(hot))
        np.testing.assert_allclose(out, host[hot], rtol=1e-6)
    assert cache.misses == m0, "repeat lookups must all hit"
    assert cache.hit_rate > 0.7


def test_cache_eviction_prefers_cold(rng):
    n, f = 128, 4
    host = rng.standard_normal((n, f)).astype(np.float32)
    cache = DeviceLFUCache(host, capacity=16, ways=4)
    hot = np.arange(4, dtype=np.int32)
    for _ in range(10):
        cache.gather(hot)  # build up frequency
    # flood with cold ids; hot rows should mostly survive (their counters
    # are high, so they are not the LFU victims within their sets)
    for trial in range(8):
        cold = rng.integers(4, n, 16).astype(np.int32)
        cache.gather(cold)
    m0 = cache.misses
    cache.gather(hot)
    hot_misses = cache.misses - m0
    assert hot_misses <= 2, f"too many hot rows evicted: {hot_misses}"


def test_cache_drop_all(rng):
    n, f = 64, 4
    host = rng.standard_normal((n, f)).astype(np.float32)
    cache = DeviceLFUCache(host, capacity=32, ways=4)
    ids = np.arange(8, dtype=np.int32)
    cache.gather(ids)
    cache.drop_all()
    assert cache.hits == 0 and cache.misses == 0
    out = np.asarray(cache.gather(ids))  # all miss again, still correct
    np.testing.assert_allclose(out, host[ids], rtol=1e-6)
    assert cache.misses == 8
