"""Probe: per-dispatch floor through the axon tunnel vs device-side
step loops (lax.scan over train steps inside one jit call).

    timeout 580 python -m benchmarks.dispatch_probe
"""

import time

import numpy as np

from bench import BATCH, DEG_ALPHA, DEG_CAP, DEG_SCALE, FANOUTS, NUM_NODES

ITERS = 200


def log(msg):
    print(f"[probe] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges_pad = -(-int(indptr_np[-1]) // 128) * 128
    indptr = jnp.asarray(indptr_np)

    @jax.jit
    def make_data():
        return jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, NUM_NODES, jnp.int32)

    indices = jax.block_until_ready(make_data())
    log("data ready")

    # 1. trivial per-dispatch floor
    @jax.jit
    def triv(acc):
        return acc + 1

    # 2. sampler, one step per dispatch
    @jax.jit
    def samp1(acc, key, indptr, indices):
        key = jax.random.fold_in(key, acc)
        seeds = jax.random.randint(key, (BATCH,), 0, NUM_NODES, jnp.int32)
        s = multihop_uniform(key, indptr, indices, seeds, FANOUTS,
                             dedup=False,
                             indices2d=indices.reshape(-1, 128),
                             max_degree=max_degree)
        return acc + jnp.sum(s.levels[-1])

    # 3. sampler, 20 steps per dispatch via scan
    @jax.jit
    def samp20(acc, key, indptr, indices):
        def body(carry, i):
            k = jax.random.fold_in(key, i + carry)
            seeds = jax.random.randint(k, (BATCH,), 0, NUM_NODES, jnp.int32)
            s = multihop_uniform(k, indptr, indices, seeds, FANOUTS,
                                 dedup=False,
                                 indices2d=indices.reshape(-1, 128),
                                 max_degree=max_degree)
            return carry + jnp.sum(s.levels[-1]), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(20, dtype=jnp.int32))
        return acc

    key = jax.random.PRNGKey(7)

    def timed(name, fn, iters, per):
        def loop(n):
            acc = jnp.zeros((), jnp.int32)
            for _ in range(n):
                acc = fn(acc)
            return int(acc)
        loop(2)
        t0 = time.perf_counter(); loop(2); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(iters + 2)
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / (iters * per):.3f} ms/unit "
            f"({1e3 * dt / iters:.3f} ms/dispatch)")

    timed("trivial acc+1      ", lambda a: triv(a), 400, 1)
    timed("sampler x1/dispatch", lambda a: samp1(a, key, indptr, indices),
          ITERS, 1)
    timed("sampler x20 scan   ", lambda a: samp20(a, key, indptr, indices),
          20, 20)


if __name__ == "__main__":
    main()
