"""Isolate the hetero one-hop sample cost at mag hop-2 scale."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.model_bench import (  # noqa: E402
    MAG_FANOUTS,
    MAG_MEAN_DEG,
    MAG_PAPER,
    MAG_SRC_RANGE,
)


def log(m):
    print(f"[hop] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops import sample as sample_ops

    n_total = MAG_PAPER + 1_134_649 + 59_965
    host = np.random.default_rng(1)
    en = "paper__cites__paper"
    c = MAG_MEAN_DEG[en] / 2.0
    deg = np.zeros(n_total, np.int64)
    deg[:MAG_PAPER] = np.minimum(
        np.floor(c * host.random(MAG_PAPER) ** -0.5), 2000)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    maxdeg = int(deg.max())
    ne = int(indptr[-1])
    nep = -(-ne // 128) * 128
    ip = jnp.asarray(indptr)
    S = 10752  # hop-2 frontier size
    K = 8

    @jax.jit
    def make(ip):
        lo, hi = MAG_SRC_RANGE[en]
        idx = jax.random.randint(jax.random.PRNGKey(1), (nep,), lo, hi,
                                 jnp.int32)
        return idx

    ix = jax.block_until_ready(make(ip))
    log(f"ready ({ne} edges, maxdeg {maxdeg})")

    def timed(body, label, reps=10, nb=5):
        @jax.jit
        def blk(acc, key, ip, ix):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), ip, ix), None
            a2, _ = jax.lax.scan(step, acc, jnp.arange(reps, dtype=jnp.int32))
            return a2
        key = jax.random.PRNGKey(3)
        int(blk(jnp.zeros((), jnp.int32), key, ip, ix))
        def loop(n):
            nonlocal key
            a = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                a = blk(a, sk, ip, ix)
            return int(a)
        loop(1)
        t0 = time.perf_counter(); loop(1); small = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(nb + 1)
        ms = max(time.perf_counter() - t0 - small, 1e-9) / (nb * reps) * 1e3
        log(f"{label}: {ms:.3f} ms")
        return ms

    def one_hop(acc, key, ip, ix):
        seeds = jax.random.randint(key, (S,), 0, n_total, jnp.int32)
        out = sample_ops.uniform_sample(
            key, ip, ix, seeds, K, indices2d=ix.reshape(-1, 128),
            max_degree=maxdeg)
        return acc + jnp.sum(out.neighbors[:, 0]).astype(jnp.int32)

    def one_hop_hubfrac(acc, key, ip, ix):
        seeds = jax.random.randint(key, (S,), 0, n_total, jnp.int32)
        out = sample_ops.uniform_sample(
            key, ip, ix, seeds, K, indices2d=ix.reshape(-1, 128),
            max_degree=maxdeg, hub_frac=0.01)
        return acc + jnp.sum(out.neighbors[:, 0]).astype(jnp.int32)

    def indptr_reads(acc, key, ip, ix):
        seeds = jax.random.randint(key, (S,), 0, n_total, jnp.int32)
        start = ip[seeds]
        d = ip[seeds + 1] - start
        return acc + jnp.sum(start + d).astype(jnp.int32)

    timed(one_hop, "one-hop S=10752 (auto hub cap s//8)")
    timed(one_hop_hubfrac, "one-hop S=10752 (hub_frac 0.01)")
    timed(indptr_reads, "indptr gathers only")


if __name__ == "__main__":
    main()
