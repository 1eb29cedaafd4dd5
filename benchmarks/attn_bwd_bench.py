"""Focused fused-attention backward bench (round 4): the one-pass
kernel (single orientation + column-sum/shifted-plane epilogue) vs the
two-orientation fused kernel, single- and multi-head, on the products-
scale banded graph.

    timeout 580 python -m benchmarks.attn_bwd_bench
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
    print(f"[attn_bwd] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        AttnSlabPair, slab_attention_bwd, slab_attention_bwd_mh)
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import SlabGraph

    nb = N // R

    @jax.jit
    def make_data():
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 10)
        ell = jax.random.randint(ks[0], (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ell = jnp.where(lane < DEG, ell, -1)
        t_ell = jax.random.randint(ks[1], (N, K), 0, 3 * R, jnp.int32)
        t_ell = jnp.where(lane < DEG, t_ell, -1)
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
        return ell, t_ell, x, g, a_d, a_s, m, s, t, bits

    (ell, t_ell, x, g, a_d, a_s, m_st, s_st, t_st,
     bits) = jax.block_until_ready(make_data())
    base = SlabGraph(ell=ell, ell_w=None,
                     fb_src=jnp.zeros((0,), jnp.int32),
                     fb_dst=jnp.zeros((0,), jnp.int32), fb_w=None,
                     degrees=jnp.full((N,), DEG, jnp.int32),
                     num_rows=N, block_rows=R, n_blocks=nb)
    edges = N * DEG
    log(f"data ready: {edges/1e6:.1f}M in-band edges")

    def timed(name, fn, arrays, e=None):
        e = e or edges

        @jax.jit
        def many(acc, *arrs):
            def body(c, i):
                o = fn(*arrs)
                return c + o[0, 0] + o[-1, -1] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        acc = jnp.zeros((), jnp.float32)
        float(many(acc, *arrays))
        t0 = time.perf_counter(); float(many(acc, *arrays))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        a = acc
        for _ in range(OUTER):
            a = many(a, *arrays)
        float(a)
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        eff = e * F * 4 / dt / 1e9
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective")

    # two-orientation fused path (no bits)
    def run_twoorient(g_ell, g_tell, g_x, ad, asx, gm, gs, gt, gg):
        pair = AttnSlabPair(fwd=base._replace(ell=g_ell), t_ell=g_tell)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg, interpret=False)
        return dx + dad[:, None] + das[:, None]

    # one-pass path (bits)
    def run_onepass(g_bits, g_x, ad, asx, gm, gs, gt, gg):
        pair = AttnSlabPair(fwd=base._replace(ell_bits=g_bits),
                            t_ell=t_ell)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg, interpret=False)
        return dx + dad[:, None] + das[:, None]

    def run_onepass_bf16(g_bits, g_x, ad, asx, gm, gs, gt, gg):
        pair = AttnSlabPair(fwd=base._replace(ell_bits=g_bits),
                            t_ell=t_ell)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg, interpret=False,
                                          compute_dtype=jnp.bfloat16)
        return dx + dad[:, None] + das[:, None]

    timed("two-orient (r3)  ", run_twoorient,
          (ell, t_ell, x, a_d, a_s, m_st, s_st, t_st, g))
    timed("one-pass bits f32", run_onepass,
          (bits, x, a_d, a_s, m_st, s_st, t_st, g))
    timed("one-pass bits bf16", run_onepass_bf16,
          (bits, x, a_d, a_s, m_st, s_st, t_st, g))

    # multi-head at N/2 (matches slab_bench scale for comparability)
    H = 4
    FH = F // H
    N2 = N // 2
    g2 = base._replace(ell=ell[:N2], degrees=base.degrees[:N2],
                       num_rows=N2, n_blocks=N2 // R)

    @jax.jit
    def make_mh():
        k = jax.random.PRNGKey(9)
        ks = jax.random.split(k, 5)
        return (jax.random.normal(ks[0], (N2, H), jnp.float32),
                jax.random.normal(ks[1], (N2, H), jnp.float32),
                jax.random.normal(ks[2], (N2, H), jnp.float32),
                jax.random.uniform(ks[3], (N2, H), jnp.float32, 1.0, 8.0),
                jax.random.normal(ks[4], (N2, H), jnp.float32))

    ad_h, as_h, m_h, s_h, t_h = jax.block_until_ready(make_mh())

    def run_mh_onepass(g_bits, g_x, ad, asx, gm, gs, gt, gg):
        pair = AttnSlabPair(fwd=g2._replace(ell_bits=g_bits),
                            t_ell=t_ell[:N2])
        dx, dad, das = slab_attention_bwd_mh(
            pair, g_x.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gg.reshape(N2, H, FH), interpret=False)
        return dx.reshape(N2, F) + dad[:, :1] + das[:, :1]

    def run_mh_onepass_bf16(g_bits, g_x, ad, asx, gm, gs, gt, gg):
        pair = AttnSlabPair(fwd=g2._replace(ell_bits=g_bits),
                            t_ell=t_ell[:N2])
        dx, dad, das = slab_attention_bwd_mh(
            pair, g_x.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gg.reshape(N2, H, FH), interpret=False,
            compute_dtype=jnp.bfloat16)
        return dx.reshape(N2, F) + dad[:, :1] + das[:, :1]

    e2 = N2 * DEG
    timed("mh(4) one-pass bits (N/2)", run_mh_onepass,
          (bits[:N2], x[:N2], ad_h, as_h, m_h, s_h, t_h, g[:N2]), e=e2)
    timed("mh(4) one-pass bits bf16 (N/2)", run_mh_onepass_bf16,
          (bits[:N2], x[:N2], ad_h, as_h, m_h, s_h, t_h, g[:N2]), e=e2)


if __name__ == "__main__":
    main()
