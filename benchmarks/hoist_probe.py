"""Probe: is the slab-kernel scan body hoisted/CSE'd when iterations
are independent?  Times one dispatch at REPS in {1, 5} for independent
vs carry-dependent bodies.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python \
        benchmarks/hoist_probe.py
"""

import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
K = 16
R = 256


def log(msg):
    print(f"[hoist] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import SlabGraph, slab_spmm

    nb = N // R

    @jax.jit
    def make_data():
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        ell = jax.random.randint(k1, (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ell = jnp.where(lane < DEG, ell, -1)
        x = jax.random.normal(k2, (N, F), jnp.float32)
        return ell, x

    ell, x = jax.block_until_ready(make_data())
    g = SlabGraph(ell=ell, ell_w=None,
                  fb_src=jnp.zeros((0,), jnp.int32),
                  fb_dst=jnp.zeros((0,), jnp.int32), fb_w=None,
                  degrees=jnp.full((N,), DEG, jnp.int32),
                  num_rows=N, block_rows=R, n_blocks=nb)
    log("data ready")

    def run(g_ell, g_x):
        gg = g._replace(ell=g_ell)
        return slab_spmm(gg, g_x, reduce="sum", compute_dtype=jnp.float32,
                         interpret=False)

    def time_one(name, reps, dependent):
        @jax.jit
        def many(acc, g_ell, g_x):
            def body(c, i):
                xx = g_x + c * 0.0 if dependent else g_x
                o = run(g_ell, xx)
                return c + o[0, 0] + o[-1, -1] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc

        acc = jnp.zeros((), jnp.float32)
        float(many(acc, ell, x))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            acc = many(acc, ell, x)
        float(acc)
        dt = (time.perf_counter() - t0) / 3
        log(f"{name}: {dt*1e3:.1f} ms/dispatch "
            f"({dt*1e3/reps:.1f} ms/iter)")
        return dt

    d1 = time_one("independent reps=1", 1, False)
    d5 = time_one("independent reps=5", 5, False)
    e1 = time_one("dependent   reps=1", 1, True)
    e5 = time_one("dependent   reps=5", 5, True)
    log(f"indep scaling 5x/1x: {d5/d1:.2f} (1.0 => hoisted, ~5 => real)")
    log(f"dep   scaling 5x/1x: {e5/e1:.2f}")


if __name__ == "__main__":
    main()
