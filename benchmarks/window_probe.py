"""Dissect the hop-2 window-gather stage: pure window vs hub machinery
vs lines=2, flat vs hierarchical select.

    timeout 580 python -m benchmarks.window_probe
"""

import time

import numpy as np

from bench import BATCH, DEG_ALPHA, DEG_CAP, DEG_SCALE, FANOUTS, NUM_NODES

REPS = 20
OUTER = 20
S2 = BATCH * (FANOUTS[0] + 1)


def log(msg):
    print(f"[wprof] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.sample import floyd_positions
    from cugraph_gnn_tpu.ops.window_gather import (
        LINE,
        gather_csr_values,
        gather_hub_compact,
        gather_window,
    )

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges_pad = -(-int(indptr_np[-1]) // 128) * 128
    indptr = jnp.asarray(indptr_np)
    k = FANOUTS[0]

    @jax.jit
    def make_data():
        return jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, NUM_NODES, jnp.int32)

    indices = jax.block_until_ready(make_data())
    log("data ready")

    def scanner(step_fn, n=REPS):
        @jax.jit
        def run(acc, key, *arrays):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                return step_fn(carry, kk, *arrays), None
            acc, _ = jax.lax.scan(body, acc, jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    def prefix(kk, indptr):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(kk, (S2, k))
        pos = floyd_positions(u, d, k)
        return start, d, pos

    def p_base(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        return acc + jnp.sum(pos) + jnp.sum(start)

    def p_hybrid4(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree,
                                max_window_lines=4)
        return acc + jnp.sum(nbr)

    def p_hybrid2(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree,
                                max_window_lines=2)
        return acc + jnp.sum(nbr)

    def p_purewin4(acc, kk, indptr, indices):
        # window only (ignores hub correctness; timing of the fast path)
        start, d, pos = prefix(kk, indptr)
        nbr = gather_window(indices.reshape(-1, 128), start,
                            jnp.where(pos < 120, pos, -1), lines=4)
        return acc + jnp.sum(nbr)

    def p_purewin2(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = gather_window(indices.reshape(-1, 128), start,
                            jnp.where(pos < 120, pos, -1), lines=2)
        return acc + jnp.sum(nbr)

    def p_hubonly(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        hub = d > 385
        nbr = gather_hub_compact(indices.reshape(-1, 128), start,
                                 jnp.where(hub[:, None], pos, -1), hub,
                                 max(LINE, S2 // 8))
        return acc + jnp.sum(nbr)

    key = jax.random.PRNGKey(9)

    def timed(name, run, arrays):
        nonlocal key

        def loop(n):
            nonlocal key
            acc = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = run(acc, sk, *arrays)
            return int(acc)

        loop(1)
        t0 = time.perf_counter(); loop(1); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(OUTER + 1)
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / (OUTER * REPS):.3f} ms/step")

    timed("base (seeds+indptr+floyd)", scanner(p_base), (indptr, indices))
    timed("hybrid lines=4 (current) ", scanner(p_hybrid4), (indptr, indices))
    timed("hybrid lines=2           ", scanner(p_hybrid2), (indptr, indices))
    timed("pure window lines=4      ", scanner(p_purewin4), (indptr, indices))
    timed("pure window lines=2      ", scanner(p_purewin2), (indptr, indices))
    timed("hub compact only         ", scanner(p_hubonly), (indptr, indices))


if __name__ == "__main__":
    main()
