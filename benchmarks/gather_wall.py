"""The random-row-gather wall, mapped honestly (round 5 #1).

VERDICT r4 asked for a committed microbenchmark proving (or refuting)
the ~227M rows/s row-rate as a hard limit.  This probe measures the XLA
row gather across batch sizes, table sizes, dtypes, and harness shapes,
with CHAINED ids (each iteration's ids derive from the previous output,
so no dispatch overlap / hoisting can flatter the number) vs the
round-1 kernel_bench harness (same ids every call, independent
dispatches) that produced the 227M rows/s figure.

Run: timeout 580 python benchmarks/gather_wall.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(f"[wall] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    results = []

    def probe(n_table, feat, dtype, batch, seed=0):
        @jax.jit
        def make():
            t = jax.random.normal(jax.random.PRNGKey(seed), (n_table, feat),
                                  dtype)
            i = jax.random.randint(jax.random.PRNGKey(seed + 1), (batch,),
                                   0, n_table, jnp.int32)
            return t, i

        table, ids = jax.block_until_ready(make())

        # table passes as an argument (closure constants re-ship through
        # the tunnel); perturb ids with a value derived from the gather.
        def stepfn(carry, table):
            ids, acc = carry
            x = table[ids]
            d = jnp.max(x[0]).astype(jnp.float32)
            pert = (d.astype(jnp.int32) & 1)
            ids2 = (ids + 1 + pert) % n_table
            return ids2, acc + d

        step_j = jax.jit(stepfn)
        def run(n):
            c = (ids, jnp.zeros((), jnp.float32))
            for _ in range(n):
                c = step_j(c, table)
            return float(c[1])
        run(2)
        t0 = time.perf_counter(); run(2); small = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter(); run(iters + 2)
        dt = max(time.perf_counter() - t0 - small, 1e-9) / iters
        rows_s = batch / dt
        bytes_row = feat * jnp.dtype(dtype).itemsize
        gb = batch * bytes_row / dt / 1e9
        r = {"table_rows": n_table, "feat": feat, "dtype": str(dtype),
             "batch": batch, "ms": round(dt * 1e3, 3),
             "Mrows_s": round(rows_s / 1e6, 1), "GBs": round(gb, 1),
             "harness": "chained"}
        results.append(r)
        log(f"chained  n={n_table:>9} {str(dtype):>8} x{feat} "
            f"batch={batch:>8}: {dt*1e3:7.3f} ms  "
            f"{rows_s/1e6:6.1f}M rows/s  {gb:6.1f} GB/s")
        return dt

    def probe_unchained(n_table, feat, dtype, batch, seed=0):
        """kernel_bench's original harness: identical independent calls."""
        @jax.jit
        def make():
            t = jax.random.normal(jax.random.PRNGKey(seed), (n_table, feat),
                                  dtype)
            i = jax.random.randint(jax.random.PRNGKey(seed + 1), (batch,),
                                   0, n_table, jnp.int32)
            return t, i

        table, ids = jax.block_until_ready(make())
        g = jax.jit(lambda t, i: t[i])
        def run(n):
            out = None
            for _ in range(n):
                out = g(table, ids)
            return float(jnp.sum(out[..., :1]))
        run(2)
        t0 = time.perf_counter(); run(2); small = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter(); run(iters + 2)
        dt = max(time.perf_counter() - t0 - small, 1e-9) / iters
        rows_s = batch / dt
        gb = batch * feat * jnp.dtype(dtype).itemsize / dt / 1e9
        results.append({"table_rows": n_table, "feat": feat,
                        "dtype": str(dtype), "batch": batch,
                        "ms": round(dt * 1e3, 3),
                        "Mrows_s": round(rows_s / 1e6, 1),
                        "GBs": round(gb, 1), "harness": "unchained"})
        log(f"unchained n={n_table:>8} {str(dtype):>8} x{feat} "
            f"batch={batch:>8}: {dt*1e3:7.3f} ms  "
            f"{rows_s/1e6:6.1f}M rows/s  {gb:6.1f} GB/s")

    N_PROD = 2_449_029  # bench graph / ogbn-products scale
    import jax.numpy as jnp  # noqa: F811

    log("backend=" + jax.default_backend())
    # batch ramp on the products-scale bf16 table (the bench's gather)
    for batch in (65536, 131072, 262144, 524288, 1048576, 2097152):
        probe(N_PROD, 128, jnp.bfloat16, batch)
    # f32 table, same ramp
    for batch in (131072, 1048576):
        probe(N_PROD, 128, jnp.float32, batch)
    # table-size sensitivity at fixed 1M batch, f32 (kernel_bench's shape)
    for n in (1_000_000, 10_000_000):
        probe(n, 128, jnp.float32, 1048576)
    # the original unchained harness for comparison (both table sizes)
    probe_unchained(10_000_000, 128, jnp.float32, 1048576)
    probe_unchained(N_PROD, 128, jnp.float32, 1048576)
    probe_unchained(N_PROD, 128, jnp.bfloat16, 1048576)

    with open("benchmarks/gather_wall_results.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote benchmarks/gather_wall_results.json")


if __name__ == "__main__":
    main()
