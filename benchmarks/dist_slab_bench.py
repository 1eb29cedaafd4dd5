"""Sharded full-batch slab SpMM on the real chip (1-device mesh):
quantifies the sharding overhead vs the single-device slab kernel —
same banded graph, same MXU work, plus the shard_map/halo machinery.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python \
        benchmarks/dist_slab_bench.py
"""

import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
K = 16
R = 256
REPS = 5
OUTER = 4


def log(msg):
    print(f"[dslab] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cugraph_gnn_tpu.ops.dist_full_batch import DistFullBatchGraph
    from cugraph_gnn_tpu.parallel import STORE_AXIS

    mesh = Mesh(np.array(jax.devices()[:1]), (STORE_AXIS,))
    sh = NamedSharding(mesh, P(STORE_AXIS))

    # banded synthetic graph at products scale, fully in-band
    host = np.random.default_rng(0)
    src = np.clip(
        np.repeat(np.arange(N, dtype=np.int64), DEG)
        + host.integers(-R, R + 1, N * DEG), 0, N - 1).astype(np.int32)
    dst = np.repeat(np.arange(N, dtype=np.int64), DEG).astype(np.int32)
    t0 = time.perf_counter()
    g = DistFullBatchGraph.from_coo(src, dst, N, mesh, reorder="none",
                                    block_rows=R, max_k=K)
    log(f"build {time.perf_counter()-t0:.1f}s, band_fraction "
        f"{g.band_fraction:.3f}")

    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (g._n_pad, F), jnp.float32),
        out_shardings=sh)()
    jax.block_until_ready(x)
    edges = N * DEG

    # The structure arrays go in as jit ARGUMENTS: through the axon
    # tunnel, closure-captured device arrays are re-shipped with every
    # dispatch (measured 2330 ms/call = 157MB ELL at tunnel rate; on a
    # directly-attached host the closure path is equivalent).
    # Iterations are made DEPENDENT (xx perturbed by the carry) so the
    # scan body cannot be hoisted as loop-invariant.
    ell, fb_s, fb_d = g.spmm_arrays()

    def timed(name, call, *arrays):
        @jax.jit
        def many(acc, xx, *arrs):
            def body(c, i):
                o = call(xx + c * 0.0, *arrs)
                return c + o[0, 0] + o[-1, -1] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        acc = jnp.zeros((), jnp.float32)
        float(many(acc, x, *arrays))
        t0 = time.perf_counter()
        a = acc
        for _ in range(OUTER):
            a = many(a, x, *arrays)
        float(a)
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        eff = edges * F * 4 / dt / 1e9
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective")

    timed("dist slab spmm (1-dev mesh)",
          lambda xx, e, s, d: g.spmm_with_arrays(xx, e, s, d),
          ell, fb_s, fb_d)

    # single-device slab kernel on the same graph, same discipline
    from cugraph_gnn_tpu.native import build_csr
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
        build_slab_graph, slab_spmm)
    indptr, indices, _ = build_csr(dst, src, N)
    gs = build_slab_graph(indptr, indices, block_rows=R, max_k=K)

    def single(xx, g_ell):
        gg = gs._replace(ell=g_ell)
        return slab_spmm(gg, xx[:N], reduce="sum",
                         compute_dtype=jnp.float32, interpret=False)

    timed("single-dev slab spmm       ", single, gs.ell)


if __name__ == "__main__":
    main()
