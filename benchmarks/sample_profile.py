"""Micro-profile of the uniform sampler pieces at bench hop-2 shape
(degree-biased seeds + targets, matching the skewed bench graph).

CAVEAT: these stages time ONE dispatch per iteration, and through the
axon tunnel a dispatch with large device-array arguments costs ~1.7 ms
of fixed overhead (the scan-amortized full sampler measures 1.19 ms
while 'multihop' here reads ~2.9).  Only the DELTAS between stages are
meaningful; use benchmarks/stage_profile.py for absolute numbers.

    timeout 580 python -m benchmarks.sample_profile
"""

import time

import numpy as np

from bench import BATCH, DEG_ALPHA, DEG_CAP, DEG_SCALE, FANOUTS, NUM_NODES

ITERS = 200
S2 = BATCH * (FANOUTS[0] + 1)  # hop-2 seed count (11264)


def log(msg):
    print(f"[sprof] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.sample import floyd_positions, uniform_sample
    from cugraph_gnn_tpu.ops.window_gather import gather_csr_values
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges = int(indptr_np[-1])
    num_edges_pad = -(-num_edges // 128) * 128
    indptr = jnp.asarray(indptr_np)
    k = FANOUTS[0]

    from cugraph_gnn_tpu.ops.window_gather import hub_fraction_edgewise
    hub_frac = hub_fraction_edgewise(indptr_np)

    @jax.jit
    def make_data(indptr):
        # degree-proportional targets, matching bench.py
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, num_edges,
            jnp.int32)
        return (jnp.searchsorted(indptr, slot, side="right") - 1
                ).astype(jnp.int32)

    indices = jax.block_until_ready(make_data(indptr))
    log(f"data ready ({num_edges} edges, max_deg {max_degree})")

    @jax.jit
    def v_indptr(acc, key, indptr, indices):
        seeds = indices[jax.random.randint(key, (S2,), 0, num_edges,
                                   jnp.int32)]  # degree-biased
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        return acc + jnp.sum(start) + jnp.sum(d)

    @jax.jit
    def v_floyd(acc, key, indptr, indices):
        seeds = indices[jax.random.randint(key, (S2,), 0, num_edges,
                                   jnp.int32)]  # degree-biased
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(key, (S2, k))
        pos = floyd_positions(u, d, k)
        return acc + jnp.sum(pos) + jnp.sum(start)

    @jax.jit
    def v_window(acc, key, indptr, indices):
        seeds = indices[jax.random.randint(key, (S2,), 0, num_edges,
                                   jnp.int32)]  # degree-biased
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(key, (S2, k))
        pos = floyd_positions(u, d, k)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree,
                                hub_frac=hub_frac)
        return acc + jnp.sum(nbr)

    @jax.jit
    def v_onehop(acc, key, indptr, indices):
        seeds = indices[jax.random.randint(key, (S2,), 0, num_edges,
                                   jnp.int32)]  # degree-biased
        out = uniform_sample(key, indptr, indices, seeds, k,
                             indices2d=indices.reshape(-1, 128),
                             max_degree=max_degree,
                             hub_frac=hub_frac)
        return acc + jnp.sum(out.neighbors)

    @jax.jit
    def v_multihop(acc, key, indptr, indices):
        seeds = jax.random.randint(key, (BATCH,), 0, NUM_NODES, jnp.int32)
        s = multihop_uniform(key, indptr, indices, seeds, FANOUTS,
                             dedup=False,
                             indices2d=indices.reshape(-1, 128),
                             max_degree=max_degree,
                             hub_frac=hub_frac)
        return acc + jnp.sum(s.levels[-1])

    key = jax.random.PRNGKey(7)

    def timed(name, fn):
        nonlocal key

        def loop(n):
            nonlocal key
            acc = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = fn(acc, sk)
            return int(acc)

        loop(2)
        t0 = time.perf_counter(); loop(2); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(ITERS + 2)
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / ITERS:.3f} ms/iter")

    timed("seeds+indptr-reads ", lambda a, k: v_indptr(a, k, indptr, indices))
    timed("+floyd             ", lambda a, k: v_floyd(a, k, indptr, indices))
    timed("+window-gather     ", lambda a, k: v_window(a, k, indptr, indices))
    timed("one-hop complete   ", lambda a, k: v_onehop(a, k, indptr, indices))
    timed("multihop [10,10]   ", lambda a, k: v_multihop(a, k, indptr, indices))


if __name__ == "__main__":
    main()
