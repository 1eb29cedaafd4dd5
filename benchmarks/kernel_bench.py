"""Kernel micro-benchmarks: gather / scatter / SpMM bandwidth (GB/s).

TPU analog of the reference's bench harness
(ref cpp/bench/wholememory_ops/gather_scatter_bench.cu:338-353 reports
Bandwidth GB/s; harness ref cpp/bench/common/wholegraph_benchmark.hpp).

Run on the real chip:  python benchmarks/kernel_bench.py
Prints one JSON line per kernel.

v5e speed-of-light: ~819 GB/s HBM.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(m):
    print(f"[kbench] {m}", file=sys.stderr, flush=True)


def timed(fn, *args, iters=50, warmup=5):
    """Per-iter time via iteration-count differencing with a dependent
    scalar readback at the end: `block_until_ready` through the axon
    tunnel does NOT reliably wait for completion, and a bare readback
    has a large fixed cost — the difference of two runs cancels both.
    Chains each iteration on the previous output to prevent overlap
    tricks."""
    import jax
    import jax.numpy as jnp

    def run(n):
        out = fn(*args)
        for _ in range(n - 1):
            out = fn(*args)
        # dependent readback forces completion of the whole chain
        return float(jnp.sum(out[..., :1]))

    run(2)  # warm compile incl. the sum program
    t0 = time.perf_counter()
    run(2)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters + 2)
    t_big = time.perf_counter() - t0
    return max(t_big - t_small, 1e-9) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    results = []
    N, F = 10_000_000, 128
    B = 1_000_000

    @jax.jit
    def make():
        table = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, N, jnp.int32)
        return table, ids

    table, ids = jax.block_until_ready(make())
    log("data ready")

    # 1. XLA row gather
    gather = jax.jit(lambda t, i: t[i])
    dt = timed(gather, table, ids)
    gb = B * F * 4 / dt / 1e9
    results.append({"kernel": "gather_xla", "value": round(gb, 1),
                    "unit": "GB/s", "ms": round(dt * 1e3, 3)})
    log(f"gather_xla: {gb:.1f} GB/s ({dt*1e3:.2f} ms)")

    # 2. Pallas row gather
    try:
        from cugraph_gnn_tpu.ops.pallas.gather_kernel import gather_rows_tpu
        pg = jax.jit(lambda t, i: gather_rows_tpu(t, i))
        dt = timed(pg, table, ids)
        gb = B * F * 4 / dt / 1e9
        results.append({"kernel": "gather_pallas", "value": round(gb, 1),
                        "unit": "GB/s", "ms": round(dt * 1e3, 3)})
        log(f"gather_pallas: {gb:.1f} GB/s ({dt*1e3:.2f} ms)")
    except Exception as e:  # keep the bench alive if the kernel breaks
        log(f"gather_pallas failed: {type(e).__name__}: {e}")

    # 3. Scatter-add (gradient push pattern)
    scatter = jax.jit(lambda t, i, v: t.at[i].add(v))
    vals = jax.block_until_ready(
        jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(2), (B, F), jnp.float32))())
    dt = timed(scatter, table, ids, vals)
    gb = B * F * 4 * 2 / dt / 1e9  # read+write
    results.append({"kernel": "scatter_add_xla", "value": round(gb, 1),
                    "unit": "GB/s", "ms": round(dt * 1e3, 3)})
    log(f"scatter_add_xla: {gb:.1f} GB/s ({dt*1e3:.2f} ms)")

    # 4. Segment SpMM (full-batch aggregation): E edges over Nv nodes
    Nv, E2, F2 = 1_000_000, 16_000_000, 128

    @jax.jit
    def make_graph():
        src = jax.random.randint(jax.random.PRNGKey(3), (E2,), 0, Nv,
                                 jnp.int32)
        dst_sorted = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(4), (E2,), 0, Nv, jnp.int32))
        x = jax.random.normal(jax.random.PRNGKey(5), (Nv, F2), jnp.float32)
        return src, dst_sorted, x

    src, dst, x = jax.block_until_ready(make_graph())
    from cugraph_gnn_tpu.ops.spmm import segment_spmm
    f = jax.jit(lambda x, s, d: segment_spmm(
        x, s, d, Nv, reduce="sum", indices_are_sorted=True))
    dt = timed(f, x, src, dst, iters=20)
    gb = E2 * F2 * 4 / dt / 1e9  # the gather traffic lower bound
    results.append({"kernel": "segment_spmm_xla", "value": round(gb, 1),
                    "unit": "GB/s(effective)", "ms": round(dt * 1e3, 2)})
    log(f"segment_spmm_xla: {gb:.1f} GB/s effective ({dt*1e3:.2f} ms)")

    # 4b. Degree-bucketed ELL SpMM (gather-based reassembly)
    from cugraph_gnn_tpu.ops.spmm import EllBuckets, ell_spmm
    t0 = time.perf_counter()
    indptr_np = np.zeros(Nv + 1, np.int64)
    np.add.at(indptr_np[1:], np.asarray(dst), 1)
    indptr_np = np.cumsum(indptr_np)
    buckets = EllBuckets(indptr_np, np.asarray(src), max_k=64)
    log(f"ell buckets built in {time.perf_counter()-t0:.1f}s")
    g2 = jax.jit(lambda x: ell_spmm(buckets, x, reduce="sum"))
    dt = timed(g2, x, iters=20)
    gb = E2 * F2 * 4 / dt / 1e9
    results.append({"kernel": "ell_spmm", "value": round(gb, 1),
                    "unit": "GB/s(effective)", "ms": round(dt * 1e3, 2)})
    log(f"ell_spmm: {gb:.1f} GB/s effective ({dt*1e3:.2f} ms)")

    # 5. Fixed-fanout aggregation (sampled path): S x k x F mean
    from cugraph_gnn_tpu.ops.spmm import fanout_aggregate
    S, K = 100_000, 10

    @jax.jit
    def make_fan():
        xn = jax.random.normal(jax.random.PRNGKey(6), (S, K, F2), jnp.float32)
        mask = jax.random.bernoulli(jax.random.PRNGKey(7), 0.9, (S, K))
        return xn, mask

    xn, mask = jax.block_until_ready(make_fan())
    g = jax.jit(lambda xn, m: fanout_aggregate(xn, m, "mean"))
    dt = timed(g, xn, mask)
    gb = S * K * F2 * 4 / dt / 1e9
    results.append({"kernel": "fanout_aggregate", "value": round(gb, 1),
                    "unit": "GB/s", "ms": round(dt * 1e3, 3)})
    log(f"fanout_aggregate: {gb:.1f} GB/s ({dt*1e3:.2f} ms)")

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
