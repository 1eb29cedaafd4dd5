"""Hoisting re-verification (round 4): for each headline slab path,
compare per-iter cost at REPS=1 vs REPS=8.  If per-iter cost collapses
with REPS, XLA hoisted the loop-invariant body out of the scan and the
scan-amortized number is a per-dispatch artifact; if it stays flat, the
number is genuine per-iteration work.

Also times each path with a CARRY-DEPENDENT perturbation (x + eps*acc)
that defeats hoisting by construction — the trustworthy number.

    timeout 580 python -m benchmarks.hoist_check
"""

import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
K = 16
R = 256
OUTER = 3


def log(msg):
    print(f"[hoist] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        AttnSlabPair, slab_attention_bwd)
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import SlabGraph, slab_spmm

    nb = N // R

    @jax.jit
    def make_data():
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 10)
        ell = jax.random.randint(ks[0], (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ell = jnp.where(lane < DEG, ell, -1)
        x = jax.random.normal(ks[2], (N, F), jnp.float32)
        g = jax.random.normal(ks[3], (N, F), jnp.float32)
        a_d = jax.random.normal(ks[4], (N,), jnp.float32)
        a_s = jax.random.normal(ks[5], (N,), jnp.float32)
        m = jax.random.normal(ks[6], (N,), jnp.float32)
        s = jax.random.uniform(ks[7], (N,), jnp.float32, 1.0, 8.0)
        t = jax.random.normal(ks[8], (N,), jnp.float32)
        planes = jax.random.bernoulli(ks[9], DEG / (3.0 * R), (N, 128, 8))
        w = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
        bits = jnp.sum(planes * w, axis=-1).astype(jnp.int8)
        return ell, x, g, a_d, a_s, m, s, t, bits

    (ell, x, g, a_d, a_s, m_st, s_st, t_st,
     bits) = jax.block_until_ready(make_data())
    base = SlabGraph(ell=ell, ell_w=None,
                     fb_src=jnp.zeros((0,), jnp.int32),
                     fb_dst=jnp.zeros((0,), jnp.int32), fb_w=None,
                     degrees=jnp.full((N,), DEG, jnp.int32),
                     num_rows=N, block_rows=R, n_blocks=nb,
                     ell_bits=bits)
    # adjacency arrays must ride as ARGUMENTS — closure constants are
    # re-shipped per dispatch through the tunnel (PERF_NOTES.md)
    edges = N * DEG
    log("data ready")

    def timed(name, fn, arrays, reps, perturb=False):
        @jax.jit
        def many(acc, *arrs):
            def body(c, i):
                if perturb:
                    # carry-dependent input: cannot be hoisted
                    arrs2 = (arrs[0] + 1e-30 * c,) + arrs[1:]
                else:
                    arrs2 = arrs
                o = fn(*arrs2)
                return c + o[0, 0] + o[-1, -1] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc

        acc = jnp.zeros((), jnp.float32)
        float(many(acc, *arrays))
        t0 = time.perf_counter()
        a = acc
        for _ in range(OUTER):
            a = many(a, *arrays)
        float(a)
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * reps)
        eff = edges * F * 4 / dt / 1e9
        tag = "perturbed" if perturb else f"reps={reps}"
        log(f"{name} [{tag}]: {dt*1e3:.2f} ms/iter -> {eff:.0f} GB/s eff")

    def run_spmm_bits(g_x, g_bits):
        gg = base._replace(ell_bits=g_bits)
        return slab_spmm(gg, g_x, reduce="sum",
                         compute_dtype=jnp.bfloat16, interpret=False)

    def run_bwd(g_x, g_bits, g_ell, ad, asx, gm, gs, gt, gg_out):
        pair = AttnSlabPair(fwd=base._replace(ell_bits=g_bits, ell=g_ell),
                            t_ell=g_ell)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg_out, interpret=False)
        return dx + dad[:, None] + das[:, None]

    for reps in (1, 8):
        timed("spmm bits", run_spmm_bits, (x, bits), reps)
    timed("spmm bits", run_spmm_bits, (x, bits), 8, perturb=True)
    bwd_args = (x, bits, ell, a_d, a_s, m_st, s_st, t_st, g)
    for reps in (1, 8):
        timed("attn bwd onepass", run_bwd, bwd_args, reps)
    timed("attn bwd onepass", run_bwd, bwd_args, 8, perturb=True)


if __name__ == "__main__":
    main()
