"""Stage split for the hetero RGCN bench (part B of model_bench):
sample-only vs sample+gather vs full step, plus append_unique isolated.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.model_bench import (  # noqa: E402
    FEAT_DIM,
    MAG_BATCH,
    MAG_FANOUTS,
    MAG_FIELD,
    MAG_MEAN_DEG,
    MAG_PAPER,
    MAG_SRC_RANGE,
    REPS,
)


def log(m):
    print(f"[hprobe] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.unique import append_unique
    from cugraph_gnn_tpu.sampler.hetero import hetero_multihop

    n_total = MAG_PAPER + 1_134_649 + MAG_FIELD
    host = np.random.default_rng(1)
    etypes = list(MAG_FANOUTS)
    indptrs, maxdeg, nedges = {}, {}, {}
    for en in etypes:
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
        for i, en in enumerate(etypes):
            lo, hi = MAG_SRC_RANGE[en]
            nep = -(-nedges[en] // 128) * 128
            idx = jax.random.randint(
                jax.random.PRNGKey(10 + i), (nep,), lo, hi, jnp.int32)
            csrs[en] = (ips[en], idx)
        feats = jax.random.normal(
            jax.random.PRNGKey(20), (n_total, FEAT_DIM), jnp.float32)
        return csrs, feats

    csrs, feats = jax.block_until_ready(make_data(ip_j))
    log("data ready")

    growth = [1 + sum(MAG_FANOUTS[en][h] for en in etypes) for h in range(2)]
    caps = [MAG_BATCH]
    for g in growth:
        caps.append(caps[-1] * g)
    edge_bases = {en: 0 for en in etypes}

    def timed(body, label, args):
        @jax.jit
        def blk(acc, key, *a):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), *a), None
            acc2, _ = jax.lax.scan(step, acc,
                                   jnp.arange(REPS, dtype=jnp.int32))
            return acc2
        key = jax.random.PRNGKey(7)
        int(blk(jnp.zeros((), jnp.int32), key, *args))
        def loop(n):
            nonlocal key
            a = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                a = blk(a, sk, *args)
            return int(a)
        loop(1)
        t0 = time.perf_counter(); loop(1); small = time.perf_counter() - t0
        NB = 5
        t0 = time.perf_counter(); loop(NB + 1)
        ms = max(time.perf_counter() - t0 - small, 1e-9) / (NB * REPS) * 1e3
        log(f"{label}: {ms:.2f} ms/step")
        return ms

    def sample_body(acc, key, csrs, feats):
        seeds = jax.random.randint(
            jax.random.fold_in(key, 99), (MAG_BATCH,), 0, MAG_PAPER,
            jnp.int32)
        s = hetero_multihop(key, csrs, seeds, etype_names=etypes,
                            fanouts=MAG_FANOUTS, edge_bases=edge_bases,
                            max_degrees=maxdeg, caps=caps)
        return acc + jnp.sum(s.levels[-1]).astype(jnp.int32)

    def sg_body(acc, key, csrs, feats):
        seeds = jax.random.randint(
            jax.random.fold_in(key, 99), (MAG_BATCH,), 0, MAG_PAPER,
            jnp.int32)
        s = hetero_multihop(key, csrs, seeds, etype_names=etypes,
                            fanouts=MAG_FANOUTS, edge_bases=edge_bases,
                            max_degrees=maxdeg, caps=caps)
        x = feats[jnp.clip(s.input_nodes, 0)]
        return acc + jnp.sum(x).astype(jnp.int32)

    def uniq_body(acc, key, csrs, feats):
        # isolated append_unique at hop-2 scale
        t = jax.random.randint(key, (caps[1],), 0, n_total, jnp.int32)
        nb = jax.random.randint(jax.random.fold_in(key, 1),
                                (caps[1] * (growth[1] - 1),), 0, n_total,
                                jnp.int32)
        u = append_unique(t, nb, max_unique=caps[2])
        return acc + jnp.sum(u.unique_nodes[:8]).astype(jnp.int32)

    args = (csrs, feats)
    timed(sample_body, "hetero sample (2 hops, 3 etypes)", args)
    timed(sg_body, "sample + feature gather", args)
    timed(uniq_body, "append_unique hop-2 alone", args)


if __name__ == "__main__":
    main()
