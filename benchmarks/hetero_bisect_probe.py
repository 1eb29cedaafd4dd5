"""Bisect the hetero multihop cost: hops x etypes grid."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.model_bench import (  # noqa: E402
    MAG_BATCH,
    MAG_FANOUTS,
    MAG_MEAN_DEG,
    MAG_PAPER,
    MAG_SRC_RANGE,
)


def log(m):
    print(f"[bisect] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.sampler.hetero import hetero_multihop

    n_total = MAG_PAPER + 1_134_649 + 59_965
    host = np.random.default_rng(1)
    etypes_all = list(MAG_FANOUTS)
    indptrs, maxdeg, nedges = {}, {}, {}
    for en in etypes_all:
        c = MAG_MEAN_DEG[en] / 2.0
        deg = np.zeros(n_total, np.int64)
        deg[:MAG_PAPER] = np.minimum(
            np.floor(c * host.random(MAG_PAPER) ** -0.5), 2000)
        indptrs[en] = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
        maxdeg[en] = int(deg.max())
        nedges[en] = int(indptrs[en][-1])
    ip_j = {en: jnp.asarray(v) for en, v in indptrs.items()}

    @jax.jit
    def make_data(ips):
        csrs = {}
        for i, en in enumerate(etypes_all):
            lo, hi = MAG_SRC_RANGE[en]
            nep = -(-nedges[en] // 128) * 128
            idx = jax.random.randint(
                jax.random.PRNGKey(10 + i), (nep,), lo, hi, jnp.int32)
            csrs[en] = (ips[en], idx)
        return csrs

    csrs = jax.block_until_ready(make_data(ip_j))
    log("data ready")

    def timed_case(etypes, hops, label):
        fan = {en: MAG_FANOUTS[en][:hops] for en in etypes}
        growth = [1 + sum(fan[en][h] for en in etypes) for h in range(hops)]
        caps = [MAG_BATCH]
        for g in growth:
            caps.append(caps[-1] * g)
        sub = {en: csrs[en] for en in etypes}
        eb = {en: 0 for en in etypes}
        md = {en: maxdeg[en] for en in etypes}

        def body(acc, key, sub):
            seeds = jax.random.randint(
                jax.random.fold_in(key, 99), (MAG_BATCH,), 0, MAG_PAPER,
                jnp.int32)
            s = hetero_multihop(key, sub, seeds, etype_names=etypes,
                                fanouts=fan, edge_bases=eb,
                                max_degrees=md, caps=caps)
            acc = acc + jnp.sum(s.levels[-1]).astype(jnp.int32)
            for hop in s.hops:
                for b in hop.values():
                    acc = acc + jnp.sum(b.mask).astype(jnp.int32)
                    acc = acc + jnp.sum(b.neigh_global).astype(jnp.int32)
            return acc

        @jax.jit
        def blk(acc, key, sub):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), sub), None
            a2, _ = jax.lax.scan(step, acc, jnp.arange(10, dtype=jnp.int32))
            return a2

        key = jax.random.PRNGKey(3)
        int(blk(jnp.zeros((), jnp.int32), key, sub))
        def loop(n):
            nonlocal key
            a = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                a = blk(a, sk, sub)
            return int(a)
        loop(1)
        t0 = time.perf_counter(); loop(1); small = time.perf_counter() - t0
        nb = 4
        t0 = time.perf_counter(); loop(nb + 1)
        ms = max(time.perf_counter() - t0 - small, 1e-9) / (nb * 10) * 1e3
        log(f"{label}: {ms:.2f} ms  (caps {caps})")

    timed_case(etypes_all[:1], 1, "1 etype, 1 hop")
    timed_case(etypes_all, 1, "3 etypes, 1 hop")
    timed_case(etypes_all[:1], 2, "1 etype, 2 hops")
    timed_case(etypes_all[:2], 2, "2 etypes, 2 hops")
    timed_case(etypes_all, 2, "3 etypes, 2 hops")


if __name__ == "__main__":
    main()
