"""Chained-dependency slab kernel bench (round 4) — the canonical
numbers.

The scan-amortized pattern (`fn(const_args)` inside lax.scan) is
HOISTED by XLA once the body is a bare pallas_call (no glue): the
round-4 glue-less kernels measured "4.8 TB/s effective" that way —
physically impossible.  Here every iteration feeds the kernel's output
back as its next input (x <- spmm(x), g <- dx/4), so the chain is
data-dependent and cannot be hoisted, CSE'd, or reordered.  Per-iter
cost includes ~ovh/REPS dispatch overhead (REPS=20 -> ~0.5 ms bias).

    timeout 580 python -m benchmarks.slab_chain_bench
"""

import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
K = 16
R = 256
REPS = 20
OUTER = 2


def log(msg):
    print(f"[chain] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        AttnSlabPair, slab_attention_bwd, slab_attention_bwd_mh)
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
        SlabGraph, slab_attention_spmm, slab_attention_spmm_mh, slab_spmm)

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
                     num_rows=N, block_rows=R, n_blocks=nb)
    edges = N * DEG
    log(f"data ready: {edges/1e6:.1f}M in-band edges (chain timing, "
        f"REPS={REPS})")

    def timed(name, step, x0, const, e=None, actual_bytes=None):
        """step(x, *const) -> next x (same shape/dtype); chained.
        actual_bytes: real HBM traffic per pass (DMA in + out) for the
        actual-GB/s column (VERDICT r4 #3c)."""
        e = e or edges

        @jax.jit
        def many(xc, *arrs):
            def body(c, i):
                return step(c, *arrs), None
            xc, _ = jax.lax.scan(body, xc,
                                 jnp.arange(REPS, dtype=jnp.int32))
            return xc

        x1 = many(x0, *const)
        float(x1.reshape(-1)[0])  # compile + warm + settle
        t0 = time.perf_counter()
        xc = x1
        for _ in range(OUTER):
            xc = many(xc, *const)
        float(xc.reshape(-1)[0])
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        eff = e * F * 4 / dt / 1e9
        act = ""
        if actual_bytes is not None:
            gbs = actual_bytes / dt / 1e9
            act = (f" | actual {gbs:.0f} GB/s"
                   f" ({100 * gbs / 820:.0f}% of v5e peak)")
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective{act}")
        return dt

    # ---- SpMM: x <- mean-aggregate(x) (bounded) ----
    def spmm_ell(xc, g_ell, cd):
        gg = base._replace(ell=g_ell)
        return slab_spmm(gg, xc, reduce="mean", compute_dtype=cd,
                         interpret=False)

    def spmm_bits(xc, g_bits, cd):
        gg = base._replace(ell_bits=g_bits)
        return slab_spmm(gg, xc, reduce="mean", compute_dtype=cd,
                         interpret=False)

    # actual HBM bytes per pass: bits + (G+2)/G-amplified x slab + out
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import _g_stack_for
    g_st = _g_stack_for(nb)

    def spmm_bytes(x_item, out_item):
        return (N * 128 + N * F * x_item * (g_st + 2) / g_st
                + N * F * out_item)

    timed("spmm ELL  f32 ", lambda xc, e_: spmm_ell(xc, e_, jnp.float32),
          x, (ell,))
    timed("spmm ELL  bf16", lambda xc, e_: spmm_ell(xc, e_, jnp.bfloat16),
          x, (ell,))
    timed("spmm bits f32 ", lambda xc, b_: spmm_bits(xc, b_, jnp.float32),
          x, (bits,), actual_bytes=spmm_bytes(4, 4))
    timed("spmm bits bf16", lambda xc, b_: spmm_bits(xc, b_, jnp.bfloat16),
          x, (bits,), actual_bytes=spmm_bytes(4, 4))
    timed("spmm bits bf16-x (bf16 DMA)",
          lambda xc, b_: spmm_bits(xc, b_, jnp.bfloat16),
          x.astype(jnp.bfloat16), (bits,), actual_bytes=spmm_bytes(2, 2))

    # ---- attention fwd: x <- softmax-aggregate(x) (bounded) ----
    def attn_ell(xc, g_ell, ad, asx):
        gg = base._replace(ell=g_ell)
        return slab_attention_spmm(
            gg, xc, ad, asx, interpret=False).astype(xc.dtype)

    def attn_bits(xc, g_bits, ad, asx):
        gg = base._replace(ell_bits=g_bits)
        return slab_attention_spmm(
            gg, xc, ad, asx, interpret=False).astype(xc.dtype)

    # actual bytes (G-stacked round 5): bits + ad lane block + as_t
    # margins + (G+2)/G-amplified x slab + u + packed-ms outputs
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import _attn_g_stack

    def attn_fwd_bytes(x_item):
        g_att = _attn_g_stack(nb, R, F, x_item, 128)
        return (N * 128 + N * 128 * 4 + 3 * 8 * N * 4
                + N * F * x_item * (g_att + 2) / g_att
                + N * F * 4 + N * 128 * 4)

    timed("attn fwd ELL  ", attn_ell, x, (ell, a_d, a_s))
    timed("attn fwd bits ", attn_bits, x, (bits, a_d, a_s),
          actual_bytes=attn_fwd_bytes(4))
    timed("attn fwd bits bf16-x", attn_bits, x.astype(jnp.bfloat16),
          (bits, a_d, a_s), actual_bytes=attn_fwd_bytes(2))

    # ---- attention bwd: g <- dx(g) / 4 (linear chain in g) ----
    # actual HBM bytes per pass (one-pass kernel, H=1, round-5
    # G-stacked layout): bits + center stats (N,128 f32) + as_t
    # margins + (G+2)/G x slab + g center + dad out (N,128) + dx
    # center plane + 2/G margin planes + das planes + epilogue (read
    # the planes + write dx)
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import _bwd_g_stack

    def bwd_bytes(xg_item):
        g_b = _bwd_g_stack(nb, R, F, xg_item)
        amp = (g_b + 2) / g_b
        planes = 1 + 2 / g_b
        return (N * 128 + N * 128 * 4 + 3 * 8 * N * 4
                + N * F * xg_item * amp + N * F * xg_item
                + N * 128 * 4 + N * F * 4 * planes
                + amp * 8 * N * 4
                + N * F * 4 * planes + N * F * 4)

    def bwd_bits(gc, g_bits, g_ell, xi, ad, asx, gm, gs, gt, cd):
        pair = AttnSlabPair(fwd=base._replace(ell_bits=g_bits),
                            t_ell=g_ell)
        dx, dad, das = slab_attention_bwd(pair, xi, ad, asx, gm, gs, gt,
                                          gc, interpret=False,
                                          compute_dtype=cd)
        return (dx * 0.25).astype(gc.dtype)

    timed("attn bwd bits onepass f32 ",
          lambda gc, *a: bwd_bits(gc, *a, jnp.float32), g,
          (bits, ell, x, a_d, a_s, m_st, s_st, t_st),
          actual_bytes=bwd_bytes(4))
    timed("attn bwd bits onepass bf16",
          lambda gc, *a: bwd_bits(gc, *a, jnp.bfloat16), g,
          (bits, ell, x, a_d, a_s, m_st, s_st, t_st),
          actual_bytes=bwd_bytes(4))
    timed("attn bwd bits onepass bf16 x/g",
          lambda gc, *a: bwd_bits(gc, *a, jnp.bfloat16),
          g.astype(jnp.bfloat16),
          (bits, ell, x.astype(jnp.bfloat16), a_d, a_s, m_st, s_st,
           t_st), actual_bytes=bwd_bytes(2))

    # ---- comparison variants at N/2 (full-scale two-orient bwd +
    # chain carry exceeds HBM; mh stat lanes pad 32x to lane tiles) ----
    N2 = N // 2
    e2 = N2 * DEG
    g2 = base._replace(ell=ell[:N2], degrees=base.degrees[:N2],
                       num_rows=N2, n_blocks=N2 // R)

    def bwd_ell(gc, g_ell, xi, ad, asx, gm, gs, gt):
        pair = AttnSlabPair(fwd=g2._replace(ell=g_ell), t_ell=g_ell)
        dx, dad, das = slab_attention_bwd(pair, xi, ad, asx, gm, gs, gt,
                                          gc, interpret=False)
        return dx * 0.25

    timed("attn bwd two-orient (N/2)", bwd_ell, g[:N2],
          (ell[:N2], x[:N2], a_d[:N2], a_s[:N2], m_st[:N2], s_st[:N2],
           t_st[:N2]), e=e2)

    H = 4
    FH = F // H

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

    def attn_mh_bits(xc, g_bits, ad, asx):
        gg = g2._replace(ell_bits=g_bits)
        out = slab_attention_spmm_mh(gg, xc.reshape(N2, H, FH), ad, asx,
                                     interpret=False)
        return out.reshape(N2, F)

    timed("attn fwd mh(4) bits (N/2)", attn_mh_bits, x[:N2],
          (bits[:N2], ad_h, as_h), e=e2)

    def bwd_mh_bits(gc, g_bits, g_ell, xi, ad, asx, gm, gs, gt):
        pair = AttnSlabPair(fwd=g2._replace(ell_bits=g_bits),
                            t_ell=g_ell)
        dx, dad, das = slab_attention_bwd_mh(
            pair, xi.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gc.reshape(N2, H, FH), interpret=False)
        return dx.reshape(N2, F) * 0.25

    timed("attn bwd mh(4) bits (N/2)", bwd_mh_bits, g[:N2],
          (bits[:N2], ell[:N2], x[:N2], ad_h, as_h, m_h, s_h, t_h), e=e2)


if __name__ == "__main__":
    main()
